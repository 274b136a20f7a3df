"""``python -m fts_errors_clustering_spark`` → the CLI front door."""

from .cli import main

raise SystemExit(main())
