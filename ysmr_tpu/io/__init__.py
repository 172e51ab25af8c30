"""Host-side IO: video decode/encode with background prefetch."""
