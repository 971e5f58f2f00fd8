"""Device-mesh utilities and the ICI-sharded bundle adjustment."""
