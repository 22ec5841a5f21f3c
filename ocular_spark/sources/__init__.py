"""Source/sink namespace (re-exports).

Docs/media tables are plain spark.read.parquet (Iceberg-compatible,
see README); media payload codecs and output sinks live here."""

from ocular_spark.pipeline import pack_line, unpack_line  # noqa: F401
from ocular_spark.functions.png import decode_gray_png, encode_gray_png  # noqa: F401
from ocular_spark.outputs import alto_xml, html_output, whitespace_layout  # noqa: F401
from ocular_spark.fixtures import derive_docs_and_media, media_lines_to_page_pngs  # noqa: F401
