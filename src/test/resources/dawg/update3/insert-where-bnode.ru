PREFIX : <http://example.org/u3#>
INSERT { ?s :tag [ :n ?o ] } WHERE { ?s :old ?o . FILTER(?o = 1) }
