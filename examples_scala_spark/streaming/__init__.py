from . import pipelines, sinks, stateful  # noqa: F401
