"""Multi-device sharding: video-batch data parallelism and dense-scene
assignment sharding over a jax.sharding.Mesh."""
