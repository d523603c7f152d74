"""Runtime utilities: checkpoint/resume, render config, observability."""
