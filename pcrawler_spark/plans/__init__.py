from .catalog import EpochCatalog
from .epoch import CrawlEngine, CrawlRunConfig
from .training import training_pipeline

__all__ = ["EpochCatalog", "CrawlEngine", "CrawlRunConfig", "training_pipeline"]
