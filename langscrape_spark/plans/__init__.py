from .extract import MIN_ARTICLE_BODY, MIN_HTML_LENGTH, collate_results, extract_pages

__all__ = ["MIN_ARTICLE_BODY", "MIN_HTML_LENGTH", "collate_results", "extract_pages"]
