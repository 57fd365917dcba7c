PREFIX ex: <http://example.org/>
DELETE WHERE { GRAPH <http://example.org/g1> { ?s ex:name ?n } }
