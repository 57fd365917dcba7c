PREFIX ex: <http://example.org/>
DELETE { ?a ex:knows ?b } INSERT { ?b ex:knows ?a }
WHERE { ?a ex:knows ?b }
