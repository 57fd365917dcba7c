LOAD <http://example.org/data.nt> ;
LOAD SILENT <http://example.org/data.nt> INTO GRAPH <http://example.org/g>
