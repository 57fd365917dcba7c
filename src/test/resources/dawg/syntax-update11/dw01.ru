PREFIX : <http://example.org/>
DELETE WHERE { :a ?p ?o . GRAPH :g { ?s :q ?o } }
