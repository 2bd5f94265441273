from .inspect import explain_str, assert_pushed_filters, assert_no_python_in_plan  # noqa: F401
