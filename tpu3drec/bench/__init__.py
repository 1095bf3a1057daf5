from tpu3drec.bench.synthetic import SyntheticImageGenerator, create_transform_pair
from tpu3drec.bench.metrics import AdvancedQualityMetrics
from tpu3drec.bench.stats import StatisticalAnalyzer
from tpu3drec.bench.runner import (
    UnifiedBenchmarkConfig, UnifiedBenchmarkPipeline,
    quick_synthetic_benchmark, quick_folder_benchmark,
)
