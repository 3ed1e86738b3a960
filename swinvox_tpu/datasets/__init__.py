"""Vendored dataset metadata (official split/baseline tables) as package
data, so the installed console scripts resolve taxonomies without a repo
checkout.  The repo-root ``datasets/`` directory holds the canonical
copies (see datasets/README.md for provenance); the JSON files here are
links that wheel builds materialize.  Resolution order is implemented by
:func:`swinvox_tpu.config.resolve_data_path`.
"""
