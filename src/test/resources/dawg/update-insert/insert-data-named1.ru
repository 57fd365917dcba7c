INSERT DATA { GRAPH <http://example.org/g1> {
  <http://example.org/a> <http://example.org/name> "Alice" } }
