"""Operation layer: MapReduce operation types, QL helpers, and the
LLM-data-pipeline operators, all expressed as DataFrame transforms."""
