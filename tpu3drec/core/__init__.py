from tpu3drec.core.types import Features, Matches, ScoreType, MethodResult, MatchingResult
from tpu3drec.core.config import (
    DEFAULT_CONFIG,
    PRESET_CONFIGS,
    create_config_from_preset,
    merge_configs,
    validate_config,
)
