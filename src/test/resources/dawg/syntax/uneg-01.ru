INSERT DATA { ?s <http://example.org/p> <http://example.org/o> }
