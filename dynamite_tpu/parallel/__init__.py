"""Device mesh construction, sharding specs, and distributed apply paths."""
