"""Sources & sinks: raw JSON landing (bronze), normalized readers, fetchers."""
