DROP GRAPH <http://example.org/g1>
