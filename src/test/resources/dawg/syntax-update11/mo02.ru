PREFIX : <http://example.org/>
DELETE { ?s :p ?o } WHERE { ?s :p ?o . FILTER(?o > 3) }
