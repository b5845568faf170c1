from srbx.utils import transforms  # noqa: F401
