PREFIX : <http://example.org/>
DELETE { GRAPH :g1 { ?s :p ?o } } INSERT { GRAPH :g2 { ?s :p ?o } }
WHERE { GRAPH :g1 { ?s :p ?o } }
