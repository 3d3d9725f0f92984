from .config import PipelineConfig, QualityThresholds
from .session import build_session

__all__ = ["PipelineConfig", "QualityThresholds", "build_session"]
