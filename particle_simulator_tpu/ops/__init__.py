"""Hot-path device kernels (Pallas TPU)."""
