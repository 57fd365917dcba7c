PREFIX : <http://example.org/u3#>
PREFIX g: <http://example.org/>
WITH g:g1 DELETE { ?s :p ?o } INSERT { ?s :q ?o } WHERE { ?s :p ?o . FILTER(?o > 15) }
