"""Command-line entry points: train, generate, edit, eval."""
