"""Generic best-first search (ref timemachine/fe/tree_search.py)."""

import heapq
from typing import Callable, Iterator, Sequence, TypeVar

Node = TypeVar("Node")
State = TypeVar("State")


def best_first(
    expand: Callable[[Node, State], tuple[Sequence[Node], State]],
    root: Node,
    initial_state: State,
) -> Iterator[Node]:
    """Priority-queue best-first search: yield the minimal node, push its
    children (ref tree_search.py:9-38). Stateless searches may ignore the
    state argument."""
    state = initial_state
    queue = [root]
    while queue:
        node = heapq.heappop(queue)
        children, state = expand(node, state)
        yield node
        for child in children:
            heapq.heappush(queue, child)
