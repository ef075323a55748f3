from nerf_tpu.bench.suite import BenchmarkResult, UnifiedBenchmarkSuite

__all__ = ["BenchmarkResult", "UnifiedBenchmarkSuite"]
