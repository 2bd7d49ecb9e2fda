from .transcripts import ChangeLogSpec, generate_changelog  # noqa: F401
