PREFIX ex: <http://example.org/>
DELETE DATA { ex:b ex:name "Bob" }
