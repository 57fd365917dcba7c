PREFIX : <http://example.org/>
WITH :g DELETE { ?s :old ?o } INSERT { ?s :new ?o } WHERE { ?s :old ?o }
