from fdt.utils.profiling import Timer, benchmark, trace

__all__ = ["Timer", "benchmark", "trace"]
