"""Evaluation-parameter expressions: arithmetic over runtime parameters.

Port of the reference's expression language
(core/evaluation_parameters.py:41-226): ``+ - * / ^`` with standard
precedence, parentheses, unary minus, the function set
``sin cos tan exp abs trunc round sgn now datetime timedelta``, constants
``PI``/``E``, and parameter names as free variables. Evaluated with
Python's ``ast`` over a whitelist of node types (no pyparsing dependency,
nothing outside the whitelist can execute); ``^`` is rewritten to ``**``
first, which matches the reference's tightest-binding expop.

``urn:great_expectations:`` cross-suite references (reference :273-332)
are out of scope — there is no multi-suite store in this engine; they
raise with a clear message.
"""

from __future__ import annotations

import ast
import datetime
import math
import operator
from typing import Any

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


def parse_evaluation_parameter(
    expression: str, parameters: dict[str, Any] | None = None
) -> Any:
    """Evaluate an evaluation-parameter expression against bound parameters.

    A bare parameter name returns its value unchanged (any type); anything
    else is evaluated as arithmetic. Unknown names raise, which the
    validator's catch_exceptions turns into a failed EVR for just that
    expectation."""
    parameters = parameters or {}
    if expression in parameters:
        return parameters[expression]
    if "urn:great_expectations:" in expression:
        raise EvaluationParameterError(
            "urn:great_expectations: cross-suite references are not "
            "supported by this engine (no multi-suite validation store); "
            "resolve the upstream metric and pass it as a plain parameter"
        )
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
