PREFIX ex: <http://example.org/>
INSERT { GRAPH <http://example.org/g2> { ?s ex:name ?n } }
WHERE { ?s ex:name ?n }
