INSERT DATA { GRAPH <http://example.org/g1> {
  <http://example.org/b> <http://example.org/name> "Bob" } }
