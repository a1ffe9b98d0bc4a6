"""Structured-Streaming execution of compiled rules."""

from .stream import transform_stream, transform_stream_files

__all__ = ["transform_stream", "transform_stream_files"]
