"""Constructor-signature parity against the reference, pinned as a test.

A user porting reference code 1:1 must find every constructor argument
they already use on the same-named class here. The audit parses the
reference sources with `ast` (no torch import) and compares against our
importable classes — see tools/api_parity_audit.py for the class map
(36 public classes across nets/blocks/layers/schedulers/inferers/
losses/metrics/utils/engines).

Extra TPU-side knobs (dtype, use_flash, params, ...) are allowed;
*missing* reference parameters fail this test.
"""
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
if TOOLS not in sys.path:
    sys.path.insert(0, TOOLS)

import api_parity_audit  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(api_parity_audit.REF), reason="reference tree not present"
)


def _audit_rows():
    rows = []
    for path, (module, classes) in sorted(api_parity_audit.REF_CLASSES.items()):
        for cls in classes:
            rows.append((path, module, cls))
    return rows


@pytest.mark.parametrize("path,module,cls", _audit_rows())
def test_constructor_params_superset_of_reference(path, module, cls):
    ref = api_parity_audit.ref_init_params(path, cls)
    assert ref is not None, f"{cls} not found in reference {path}"
    ours = api_parity_audit.our_init_params(module, cls)
    assert ours is not None, f"{cls} not importable from {module}"
    missing = [
        p for p in ref
        if p not in ours
        and f"{cls}.{p}" not in api_parity_audit.CONSTRUCTOR_EXCEPTIONS
    ]
    assert not missing, (
        f"{cls}: reference __init__ params missing here: {missing} "
        f"(reference generative/{path})"
    )


@pytest.mark.parametrize("path,module,cls", _audit_rows())
def test_public_methods_superset_of_reference(path, module, cls):
    """Every public reference method (and its parameter names) must exist
    here — `forward` maps to `__call__`; torch idioms with a documented
    JAX equivalent are listed in api_parity_audit.METHOD_EXCEPTIONS."""
    gaps = api_parity_audit.method_gaps(path, module, cls)
    assert not gaps, gaps


def test_audit_covers_all_reference_public_nets():
    """The class map must cover every class the reference exports from
    generative/networks/nets/__init__.py (guards against the audit
    silently going stale when the map is edited)."""
    import ast

    init = os.path.join(api_parity_audit.REF, "networks/nets/__init__.py")
    tree = ast.parse(open(init).read())
    exported = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            exported |= {
                a.name for a in node.names
                if a.name[0].isupper()  # classes, not helpers
            }
    audited = set()
    for _, (_, classes) in api_parity_audit.REF_CLASSES.items():
        audited |= set(classes)
    missing = exported - audited
    assert not missing, f"reference nets exported but not audited: {missing}"
