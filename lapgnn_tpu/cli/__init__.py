"""Command-line entry points (python -m lapgnn_tpu.cli.<tool>)."""
