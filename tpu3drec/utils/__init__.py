from tpu3drec.utils.profiling import (
    Timer, span, ProfileCollector, device_memory_stats, trace_to,
)
