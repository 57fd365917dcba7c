PREFIX ex: <http://example.org/>
DELETE WHERE { ?s ex:old ?o . GRAPH <http://example.org/g> { ?s ?p ?o } }
