PREFIX : <http://example.org/>
DELETE { ?s :p ?o } INSERT { ?s :q ?o }
