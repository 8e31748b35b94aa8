"""Binding-target fixture module (tests/test_bindings.py).

A dedicated module because pytest imports test files under a rootdir
module name while utils.bindings resolves targets via importlib --
binding an attribute of the test module itself would hit the other
copy.
"""

TUNABLE = 1.0
