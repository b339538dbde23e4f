"""Numeric / math / bit functions (reference: builtins/functions/math.cpp
``sqrt``/``abs``/``round``/``floor``/``ceil``, bit.cpp bit_and/or/xor/
shift, and TQL arithmetic). Thin aliases over ``pyarrow.compute`` — the
mapping IS the implementation: every function is a vectorized Arrow C++
kernel usable inside any ``map_batches`` expression."""

from __future__ import annotations

import pyarrow.compute as pc

# arithmetic
add = pc.add
subtract = pc.subtract
multiply = pc.multiply
divide = pc.divide
negate = pc.negate
power = pc.power
sqrt = pc.sqrt
abs_ = pc.abs
sign = pc.sign
exp = pc.exp
ln = pc.ln
log2 = pc.log2
log10 = pc.log10
logb = pc.logb

# rounding
round_ = pc.round
floor = pc.floor
ceil = pc.ceil
trunc = pc.trunc

# trigonometry
sin = pc.sin
cos = pc.cos
tan = pc.tan
asin = pc.asin
acos = pc.acos
atan = pc.atan
atan2 = pc.atan2

# bit manipulation (bit.cpp)
bit_and = pc.bit_wise_and
bit_or = pc.bit_wise_or
bit_xor = pc.bit_wise_xor
bit_not = pc.bit_wise_not
shift_left = pc.shift_left
shift_right = pc.shift_right

# null handling (functions/misc: otherwise → coalesce)
otherwise = pc.coalesce
coalesce = pc.coalesce
if_else = pc.if_else
is_null = pc.is_null
is_valid = pc.is_valid

__all__ = [
    "add", "subtract", "multiply", "divide", "negate", "power", "sqrt",
    "abs_", "sign", "exp", "ln", "log2", "log10", "logb", "round_",
    "floor", "ceil", "trunc", "sin", "cos", "tan", "asin", "acos",
    "atan", "atan2", "bit_and", "bit_or", "bit_xor", "bit_not",
    "shift_left", "shift_right", "otherwise", "coalesce", "if_else",
    "is_null", "is_valid",
]
