PREFIX ex: <http://example.org/>
INSERT DATA { ex:s ex:p "v", 4 . GRAPH <http://example.org/g> { ex:a ex:b ex:c } }
