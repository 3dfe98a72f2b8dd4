from .dom import Element, parse_html
from .xpath import xpath

__all__ = ["Element", "parse_html", "xpath"]
