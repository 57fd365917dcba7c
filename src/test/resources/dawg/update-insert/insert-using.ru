PREFIX ex: <http://example.org/>
INSERT { ?s ex:seen "yes" }
USING <http://example.org/g1>
WHERE { ?s ex:name ?n }
