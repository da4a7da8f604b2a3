from docling_eval_spark.datagen.pages import (
    PAGES_SCHEMA,
    gen_page,
    pages_dataframe,
    render_page_for_text,
    write_pages_parquet,
)

__all__ = [
    "PAGES_SCHEMA",
    "gen_page",
    "pages_dataframe",
    "render_page_for_text",
    "write_pages_parquet",
]
