LOAD SILENT <http://example.org/data.ttl> INTO GRAPH <http://example.org/g> ;
CLEAR DEFAULT ;
DROP NAMED ;
CREATE GRAPH <http://example.org/new>
