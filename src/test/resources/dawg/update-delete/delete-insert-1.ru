PREFIX ex: <http://example.org/>
DELETE { ?s ex:name ?n } INSERT { ?s ex:label ?n }
WHERE { ?s ex:name ?n }
