"""Server shell: REST + Arrow Flight front-ends over the Spark engine
(reference lib/src/server/* + lib/src/response/*)."""
