"""Evaluation-parameter expressions: arithmetic over runtime parameters.

Port of the reference's expression language
(core/evaluation_parameters.py:41-226): ``+ - * / ^`` with standard
precedence, parentheses, unary minus, the function set
``sin cos tan exp abs trunc round sgn now datetime timedelta``, constants
``PI``/``E``, and parameter names as free variables. Evaluated with
Python's ``ast`` over a whitelist of node types (no pyparsing dependency,
nothing outside the whitelist can execute); ``^`` is rewritten to ``**``
first, which matches the reference's tightest-binding expop.

``urn:great_expectations:validations:<suite>:<metric>[:<kwargs>]``
cross-suite references (reference :273-332, core/urn.py ge_validations_urn)
resolve through an ``urn_resolver`` callable — normally
``runner.ParquetStore``-backed (see runner.store_validation_result /
resolve_validation_urn): each URN in the expression is substituted with a
bound parameter holding the looked-up value, then the arithmetic
evaluates as usual. Without a resolver they raise with a clear message.
"""

from __future__ import annotations

import ast
import datetime
import math
import operator
import re
from typing import Any, Callable

_epsilon = 1e-12

_FUNCTIONS: dict[str, Any] = {
    "sin": math.sin,
    "cos": math.cos,
    "tan": math.tan,
    "exp": math.exp,
    "abs": abs,
    "trunc": lambda a: int(a),
    "round": round,
    "sgn": lambda a: -1 if a < -_epsilon else 1 if a > _epsilon else 0,
    "now": datetime.datetime.now,
    "datetime": datetime.datetime,
    "timedelta": datetime.timedelta,
}

_CONSTANTS = {"PI": math.pi, "E": math.e, "pi": math.pi, "e": math.e}

_BIN_OPS = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.Pow: operator.pow,
}


class EvaluationParameterError(ValueError):
    pass


# chars a URN may contain, per the reference grammar (core/urn.py urn_word:
# alphanums + "_$?=%.&," joined by ':')
_URN_RE = re.compile(r"urn:great_expectations:[A-Za-z0-9_$?=%.&,:]+")


def parse_evaluation_parameter(
    expression: str,
    parameters: dict[str, Any] | None = None,
    urn_resolver: Callable[[str], Any] | None = None,
) -> Any:
    """Evaluate an evaluation-parameter expression against bound parameters.

    A bare parameter name returns its value unchanged (any type); anything
    else is evaluated as arithmetic. Unknown names raise, which the
    validator's catch_exceptions turns into a failed EVR for just that
    expectation. ``urn:great_expectations:`` references hit ``parameters``
    first (the reference binds URN-keyed runtime parameters the same way,
    core/evaluation_parameters.py:340-366), then ``urn_resolver``."""
    parameters = parameters or {}
    if expression in parameters:
        return parameters[expression]
    if "urn:great_expectations:" in expression:
        if urn_resolver is None:
            raise EvaluationParameterError(
                "urn:great_expectations: cross-suite references need a "
                "results-store-backed resolver: validate with "
                "parameter_store=<ParquetStore> (or pass the resolved value "
                "as a plain parameter)"
            )
        bound: dict[str, Any] = {}

        def _sub(m: re.Match) -> str:
            if m.group(0) in parameters:  # URN bound directly as a parameter
                value = parameters[m.group(0)]
            else:
                value = urn_resolver(m.group(0))
            name = f"__urn_{len(bound)}"
            bound[name] = value
            return name

        expression = _URN_RE.sub(_sub, expression)
        parameters = {**parameters, **bound}
        if expression in parameters:  # bare-URN expression
            return parameters[expression]
    try:
        tree = ast.parse(expression.replace("^", "**"), mode="eval")
    except SyntaxError as e:
        raise EvaluationParameterError(
            f"unable to parse evaluation parameter expression {expression!r}"
        ) from e
    return _eval(tree.body, parameters)


def _eval(node: ast.AST, params: dict[str, Any]) -> Any:
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float)):
            return node.value
        raise EvaluationParameterError(f"unsupported literal {node.value!r}")
    if isinstance(node, ast.Name):
        if node.id in params:
            return params[node.id]
        if node.id in _CONSTANTS:
            return _CONSTANTS[node.id]
        raise EvaluationParameterError(f"unbound evaluation parameter {node.id!r}")
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.USub, ast.UAdd)):
        v = _eval(node.operand, params)
        return -v if isinstance(node.op, ast.USub) else v
    if isinstance(node, ast.BinOp) and type(node.op) in _BIN_OPS:
        return _BIN_OPS[type(node.op)](
            _eval(node.left, params), _eval(node.right, params)
        )
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
        fn = _FUNCTIONS.get(node.func.id)
        if fn is None:
            raise EvaluationParameterError(f"unknown function {node.func.id!r}")
        args = [_eval(a, params) for a in node.args]
        kwargs = {k.arg: _eval(k.value, params) for k in node.keywords if k.arg}
        return fn(*args, **kwargs)
    raise EvaluationParameterError(
        f"unsupported syntax in evaluation parameter expression: "
        f"{ast.dump(node)[:80]}"
    )
