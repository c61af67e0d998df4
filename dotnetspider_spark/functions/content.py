"""Content-type detection — Downloader.DetectContentType parity.

Reference (Downloader/Downloader.cs:281-306):
- header present: ``contentType.Contains("json")`` -> Json, else Html;
- header absent, string content: try JSON-parse -> Json on success,
  Html on failure;
- header absent, non-string (binary) content: Auto.

Pure built-in expressions — ``try_parse_json`` does the try-parse
JVM-side (no UDF), so the gate participates in codegen and pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

JSON = "Json"
HTML = "Html"
AUTO = "Auto"


def detect_content_type(content: Column, header: Column | None = None) -> Column:
    """ContentType column ('Json' | 'Html' | 'Auto').

    ``content`` is the textual body (null = binary/non-string payload);
    ``header`` the Content-Type response header (null/'' = absent).
    """
    parses = F.try_parse_json(content).isNotNull()
    by_body = F.when(content.isNull(), F.lit(AUTO)).otherwise(
        F.when(parses, F.lit(JSON)).otherwise(F.lit(HTML))
    )
    if header is None:
        return by_body
    has_header = header.isNotNull() & (F.trim(header) != "")
    by_header = F.when(
        F.lower(header).contains("json"), F.lit(JSON)
    ).otherwise(F.lit(HTML))
    return F.when(has_header, by_header).otherwise(by_body)
