"""Column-level functions: JVM-side text expressions + Arrow-vectorized
fingerprint kernels."""
