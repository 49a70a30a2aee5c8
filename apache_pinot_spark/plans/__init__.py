"""Planning layer: Pinot schema/table-config compilation, write-layout
policy, and the engine's custom rewrites (timestamp index, rollup)."""
