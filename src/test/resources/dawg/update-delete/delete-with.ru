PREFIX ex: <http://example.org/>
WITH <http://example.org/g1>
DELETE { ?s ex:name "Bob" } WHERE { ?s ex:name "Bob" }
