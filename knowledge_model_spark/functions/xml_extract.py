"""XML node extraction as Arrow-batched pandas UDFs.

The reference pulls abstracts and PMC full text out of E-Utilities XML
with ``xml.etree`` XPath (reference: knowledge_model/ingestion/
fetch_pubmed.py:187-219 `_efetch_abstract` joins ``AbstractText`` node
texts; :222-272 `_efetch_pmc_fulltext` joins ``.//body//p`` paragraphs
with blank lines).  Spark has no XML builtin (spark-xml is an external
package), so the same XPath-join semantics run in a pandas UDF —
per-document parse, Arrow-batched, executor-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _extract_series(xml_strings, xpath: str, sep: str):
    import xml.etree.ElementTree as ET

    import pandas as pd

    def one(x):
        if x is None:
            return None
        try:
            root = ET.fromstring(x)
        except ET.ParseError:
            return None
        parts = [
            "".join(node.itertext()).strip()
            for node in root.findall(xpath)
        ]
        parts = [p for p in parts if p]
        return sep.join(parts) if parts else None

    return pd.Series([one(x) for x in xml_strings])


def xml_text_join(col: Column, xpath: str, sep: str = "\n\n") -> Column:
    """Join the text of every node matching ``xpath``, in document order.

    ``xml_text_join(c, ".//body//p")`` reproduces the reference's PMC
    full-text extraction; ``xml_text_join(c, ".//AbstractText", " ")``
    its abstract extraction.  Malformed XML → NULL (dead-letter
    filterable), matching the reference's quarantine-on-failure.
    """
    return F.pandas_udf(lambda s: _extract_series(s, xpath, sep), "string")(col)
