PREFIX ex: <http://example.org/>
WITH <http://example.org/g1>
INSERT { ?s ex:flag "y" } WHERE { ?s ex:name ?n }
