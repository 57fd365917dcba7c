ADD <http://example.org/a> TO <http://example.org/b> ;
MOVE DEFAULT TO <http://example.org/c> ;
COPY GRAPH <http://example.org/c> TO DEFAULT
