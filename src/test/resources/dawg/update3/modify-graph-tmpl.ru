PREFIX : <http://example.org/u3#>
PREFIX g: <http://example.org/>
DELETE { GRAPH g:g1 { ?s :p ?o } }
INSERT { GRAPH g:g2 { ?s :moved ?o } }
WHERE { GRAPH g:g1 { ?s :p ?o . FILTER(?o < 15) } }
