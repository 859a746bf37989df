"""R1CS constraint-synthesis layer.

TPU re-design of the reference's `r1cs` feature (every primitive has a
"constraint gadget twin" re-expressing the computation over circuit
variables; SURVEY.md intro).  The reference builds on external
`ark-relations`/`ark-r1cs-std`; we provide our own:

  * :mod:`cs` — the constraint system: variables are integer indices,
    linear combinations are sparse dicts, constraints are (A, B, C) rows;
    witness generation runs alongside synthesis (python ints, exact).
  * :mod:`vars` — `FpVar`, `Boolean`, `UInt8`, `UInt32` gadget variables
    (behavioral twins of ark-r1cs-std's types, with the same
    constraint-count-relevant decompositions: 1 constraint per nonlinear
    mul, booleanity per allocated bit, free linear ops and free
    constant-xor).
  * :mod:`device_check` — the TPU-shaped replacement for
    `cs.is_satisfied()`: evaluate Az o Bz - Cz for the whole constraint
    matrix as one batched device program (SURVEY.md §7.7).
"""

from crypto_primitives_tpu.r1cs.cs import ConstraintSystem, LinearCombination
from crypto_primitives_tpu.r1cs.vars import Boolean, FpVar, UInt8, UInt32
