"""SQL front-end for the reference's streaming-SQL dialect."""
