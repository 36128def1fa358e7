"""Proof search subsystem: environment protocol, search tree, best-first
search, tactic generators, shared TPU inference service, distributed pool,
and the Pass@1 evaluation harness."""

from reprover_tpu.prover.environment import (
    Environment,
    EnvironmentCrashError,
    EnvironmentInitError,
    EnvironmentTimeoutError,
    FakeEnvironment,
    LeanError,
    ProofFinished,
    ProofGivenUp,
    RepoSpec,
    TacticResult,
    TacticState,
    TacticTimeout,
    Theorem,
    environment_from_dataset,
    lean_dojo_available,
)
from reprover_tpu.prover.search_tree import (
    Edge,
    ErrorNode,
    InternalNode,
    ProofFinishedNode,
    Status,
)
from reprover_tpu.prover.proof_search import BestFirstSearchProver, SearchResult
from reprover_tpu.prover.tactic_generator import (
    FixedTacticGenerator,
    LocalTacticGenerator,
    RemoteTacticGenerator,
    RetrievalAugmentedTacticGenerator,
    TacticGenerator,
)
from reprover_tpu.prover.api_generator import ApiTacticGenerator
from reprover_tpu.prover.distributed import DistributedProver
from reprover_tpu.prover.evaluate import aggregate_pass1, evaluate, get_theorems
from reprover_tpu.prover.attribution import (
    StepAttribution,
    TheoremAttribution,
    attribute_failure,
    attribute_failures,
)
from reprover_tpu.prover.service import (
    InferenceService,
    ServiceClient,
    StreamingInferenceService,
)

__all__ = [
    "Environment",
    "EnvironmentCrashError",
    "EnvironmentInitError",
    "EnvironmentTimeoutError",
    "FakeEnvironment",
    "LeanError",
    "ProofFinished",
    "ProofGivenUp",
    "RepoSpec",
    "TacticResult",
    "TacticState",
    "TacticTimeout",
    "Theorem",
    "environment_from_dataset",
    "lean_dojo_available",
    "Edge",
    "ErrorNode",
    "InternalNode",
    "ProofFinishedNode",
    "Status",
    "BestFirstSearchProver",
    "SearchResult",
    "FixedTacticGenerator",
    "LocalTacticGenerator",
    "RemoteTacticGenerator",
    "RetrievalAugmentedTacticGenerator",
    "TacticGenerator",
    "ApiTacticGenerator",
    "DistributedProver",
    "StepAttribution",
    "TheoremAttribution",
    "attribute_failure",
    "attribute_failures",
    "aggregate_pass1",
    "evaluate",
    "get_theorems",
    "InferenceService",
    "StreamingInferenceService",
    "ServiceClient",
]
