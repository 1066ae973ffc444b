"""Column functions registered by graft.plans.GraftExtensions.

Usable from any PySpark expression once the session is configured with the
graft extensions (graft.session.configure). Each helper returns a Column via
``pyspark.sql.functions.call_function`` — the native codegen'd Catalyst
expression runs, not a Python UDF.
"""

from pyspark.sql import functions as F


def rolling_hash(text):
    """64-bit rolling polynomial hash fingerprint of a string column."""
    return F.call_function("rolling_hash", text)


def canonical_fingerprint(text):
    """md5 of lowercased, punctuation-stripped, space-collapsed text."""
    return F.call_function("canonical_fingerprint", text)


def bpeish_token_count(text):
    """Subword-ish token count (letter runs, digit runs, single others)."""
    return F.call_function("bpeish_token_count", text)


def simhash64(text):
    """64-bit SimHash of whitespace tokens."""
    return F.call_function("simhash64", text)


def hamming64(a, b):
    """Hamming distance between two 64-bit signatures."""
    return F.call_function("hamming64", a, b)


def cosine_similarity(a, b):
    """Cosine similarity of two numeric array columns."""
    return F.call_function("cosine_similarity", a, b)


def dot_product(a, b):
    """Dot product of two double-array columns (codegen'd expression)."""
    return F.call_function("dot_product", a, b)
