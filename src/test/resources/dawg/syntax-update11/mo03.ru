PREFIX : <http://example.org/>
INSERT { ?s :copy ?o } USING :src USING NAMED :n WHERE { ?s :p ?o }
