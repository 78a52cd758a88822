"""Sources & sinks: synthetic pages, node-link JSON, RDF N3, KuzuDB CSV, InGram."""
