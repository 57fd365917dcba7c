PREFIX : <http://example.org/u3#>
PREFIX g: <http://example.org/>
INSERT { ?s :copied ?o } USING g:g1 WHERE { ?s :p ?o }
