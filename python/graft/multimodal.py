"""Multimodal column plumbing: binary payloads + typed metadata.

PNG payloads are really decoded (javax.imageio on the JVM side); audio and
video feature extraction is a clearly-marked deterministic stub — the
schema, batch shape, and partitioning are the production layout.
"""

from ._java import ctx, lift


def assets_from_documents(docs):
    """Demo asset table from the documents table (text bytes as payload)."""
    spark, jvm = ctx(docs)
    return lift(spark, jvm.graft.multimodal.Multimodal.assetsFromDocuments(
        docs._jdf))


def png_assets_from_documents(docs):
    """Asset table whose image rows carry REAL PNG payloads encoded from a
    deterministic pixel formula (round-trippable through the decoder)."""
    spark, jvm = ctx(docs)
    return lift(spark, jvm.graft.multimodal.Multimodal.pngAssetsFromDocuments(
        docs._jdf))


def extract_features(assets):
    """Per-asset features in one partition-local pass; image/png rows get a
    real decode (decoded_width/height/px_sum/n_px populated)."""
    spark, jvm = ctx(assets)
    return lift(spark, jvm.graft.multimodal.Multimodal.extractFeatures(
        assets._jdf))
