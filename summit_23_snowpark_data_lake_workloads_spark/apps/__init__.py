"""Consume-layer analytics apps (SURVEY §2.11) — the Spark-native
re-expression of the reference's two Streamlit pages.

Layering contract: everything data-shaped lives in engine functions that
return Spark DataFrames (server-side, Catalyst-planned) or chart-ready
pandas frames (post-``toPandas``, mirroring the reference's client-side
pandas slicing, SURVEY §2.2 P10). The Streamlit rendering is an optional
shell: ``render_page`` imports streamlit lazily and raises a clear error
when it isn't installed, so the analytics stay fully testable — and the
engine importable — in environments without it.
"""
