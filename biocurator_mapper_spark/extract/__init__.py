from .html_text import extract_text_py, with_extracted_text, EXTRACTOR_VERSION

__all__ = ["extract_text_py", "with_extracted_text", "EXTRACTOR_VERSION"]
