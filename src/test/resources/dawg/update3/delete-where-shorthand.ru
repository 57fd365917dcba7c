PREFIX : <http://example.org/u3#>
DELETE WHERE { ?s :old 1 }
