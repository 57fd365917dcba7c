PREFIX ex: <http://example.org/>
DELETE DATA { GRAPH <http://example.org/g1> { ex:b ex:name "Bob" } }
