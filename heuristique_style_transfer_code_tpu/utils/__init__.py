from .logging import StructuredLogger, maybe_profile
