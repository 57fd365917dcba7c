PREFIX ex: <http://example.org/>
INSERT { ?s ex:greeting "hi" } WHERE { ?s ex:name ?n }
