"""Device-mesh parallelism: spatial domain decomposition over TPU chips."""
