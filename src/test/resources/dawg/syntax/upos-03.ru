PREFIX ex: <http://example.org/>
WITH <http://example.org/g>
DELETE { ?s ex:state ?old }
INSERT { ?s ex:state "new" }
USING <http://example.org/h>
WHERE { ?s ex:state ?old . FILTER(?old != "new") }
