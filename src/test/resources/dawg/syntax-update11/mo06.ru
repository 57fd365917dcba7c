PREFIX : <http://example.org/>
DELETE { ?s :p [] } WHERE { ?s :p ?o }
