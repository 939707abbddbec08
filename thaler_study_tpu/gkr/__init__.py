"""The GKR protocol (ref: gkr-protocol crate)."""

from .circuit import (
    Circuit,
    CircuitEvaluation,
    CircuitLayer,
    Gate,
    GateType,
    circuit_from_book,
)
from .protocol import (
    Begin,
    FinalRoundMessage,
    GKRError,
    Prover,
    R,
    RoundStarted,
    StartSumCheck,
    SumCheckProverMessage,
    SumCheckRoundResult,
    Verifier,
    WrongVerifierState,
    line,
    restrict_poly,
)
from .round_polynomial import W

__all__ = [
    "Circuit",
    "CircuitLayer",
    "CircuitEvaluation",
    "Gate",
    "GateType",
    "circuit_from_book",
    "Prover",
    "Verifier",
    "Begin",
    "SumCheckProverMessage",
    "FinalRoundMessage",
    "StartSumCheck",
    "SumCheckRoundResult",
    "RoundStarted",
    "R",
    "line",
    "restrict_poly",
    "W",
    "GKRError",
    "WrongVerifierState",
]
