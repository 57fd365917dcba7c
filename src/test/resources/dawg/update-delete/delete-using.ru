PREFIX ex: <http://example.org/>
DELETE { ?s ex:name ?n }
USING <http://example.org/g1>
WHERE { ?s ex:name ?n }
