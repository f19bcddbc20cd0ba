"""Developer/diagnostic scripts (profiling, kernel parity probes)."""
