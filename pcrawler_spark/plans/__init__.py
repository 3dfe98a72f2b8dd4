from .catalog import EpochCatalog
from .epoch import CrawlEngine, CrawlRunConfig

__all__ = ["EpochCatalog", "CrawlEngine", "CrawlRunConfig"]
