"""Extraction subpackage: the flagship interleaved-document pipeline."""
