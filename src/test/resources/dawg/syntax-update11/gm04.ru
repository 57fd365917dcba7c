COPY <http://example.org/g>
