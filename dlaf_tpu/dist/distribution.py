"""2-D block-cyclic Distribution.

TPU-native analog of the reference's ``include/dlaf/matrix/distribution.h:111``
``Distribution`` class: pure index bookkeeping tying a global (m, n) matrix,
a (mb, nb) tile size, and a (P, Q) process/device grid together, exposing the
same global<->local conversion surface (documented in the reference at
``matrix/distribution.h:82-108``).

Unlike the reference we do not support block != tile (multi-tile blocks); the
tile IS the distribution blocking unit, which is also what every DLA-Future
algorithm actually uses.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

from . import index as ix


@dataclasses.dataclass(frozen=True)
class Distribution:
    size: Tuple[int, int]          # global (m, n) in elements
    block_size: Tuple[int, int]    # (mb, nb) in elements
    grid_size: Tuple[int, int] = (1, 1)    # (P, Q) device grid
    src_rank: Tuple[int, int] = (0, 0)     # rank owning tile (0, 0)

    def __post_init__(self):
        m, n = self.size
        mb, nb = self.block_size
        P, Q = self.grid_size
        if m < 0 or n < 0:
            raise ValueError(f"negative size {self.size}")
        if mb <= 0 or nb <= 0:
            raise ValueError(f"non-positive block size {self.block_size}")
        if P <= 0 or Q <= 0:
            raise ValueError(f"non-positive grid {self.grid_size}")
        if not (0 <= self.src_rank[0] < P and 0 <= self.src_rank[1] < Q):
            raise ValueError(f"src_rank {self.src_rank} outside grid {self.grid_size}")

    # -- global shape queries -------------------------------------------------
    @property
    def nr_tiles(self) -> Tuple[int, int]:
        return (ix.ceil_div(self.size[0], self.block_size[0]),
                ix.ceil_div(self.size[1], self.block_size[1]))

    def tile_size_of(self, tile: Tuple[int, int]) -> Tuple[int, int]:
        return (int(ix.tile_size_of(tile[0], self.size[0], self.block_size[0])),
                int(ix.tile_size_of(tile[1], self.size[1], self.block_size[1])))

    # -- ownership ------------------------------------------------------------
    def rank_global_tile(self, tile: Tuple[int, int]) -> Tuple[int, int]:
        return (ix.rank_global_tile(tile[0], self.grid_size[0], self.src_rank[0]),
                ix.rank_global_tile(tile[1], self.grid_size[1], self.src_rank[1]))

    def rank_global_element(self, el: Tuple[int, int]) -> Tuple[int, int]:
        return self.rank_global_tile(self.global_tile_index(el))

    # -- element <-> tile -----------------------------------------------------
    def global_tile_index(self, el: Tuple[int, int]) -> Tuple[int, int]:
        return (ix.tile_from_element(el[0], self.block_size[0]),
                ix.tile_from_element(el[1], self.block_size[1]))

    def tile_element_index(self, el: Tuple[int, int]) -> Tuple[int, int]:
        return (ix.tile_element_from_element(el[0], self.block_size[0]),
                ix.tile_element_from_element(el[1], self.block_size[1]))

    # -- global <-> local tiles ----------------------------------------------
    def local_tile_index(self, tile: Tuple[int, int]) -> Tuple[int, int]:
        return (ix.local_tile_from_global_tile(tile[0], self.grid_size[0]),
                ix.local_tile_from_global_tile(tile[1], self.grid_size[1]))

    def global_tile_from_local(self, ltile: Tuple[int, int],
                               rank: Tuple[int, int]) -> Tuple[int, int]:
        return (ix.global_tile_from_local_tile(ltile[0], self.grid_size[0], rank[0],
                                               self.src_rank[0]),
                ix.global_tile_from_local_tile(ltile[1], self.grid_size[1], rank[1],
                                               self.src_rank[1]))

    def next_local_tile(self, tile: Tuple[int, int],
                        rank: Tuple[int, int]) -> Tuple[int, int]:
        """First local tile on ``rank`` with global index >= ``tile`` per dim."""
        return (ix.next_local_tile_from_global_tile(tile[0], self.grid_size[0],
                                                    rank[0], self.src_rank[0]),
                ix.next_local_tile_from_global_tile(tile[1], self.grid_size[1],
                                                    rank[1], self.src_rank[1]))

    # -- local sizes ----------------------------------------------------------
    def local_nr_tiles(self, rank: Tuple[int, int]) -> Tuple[int, int]:
        mt, nt = self.nr_tiles
        return (ix.local_num_tiles(mt, self.grid_size[0], rank[0], self.src_rank[0]),
                ix.local_num_tiles(nt, self.grid_size[1], rank[1], self.src_rank[1]))

    def local_size(self, rank: Tuple[int, int]) -> Tuple[int, int]:
        return (int(ix.local_size(self.size[0], self.block_size[0], self.grid_size[0],
                                  rank[0], self.src_rank[0])),
                int(ix.local_size(self.size[1], self.block_size[1], self.grid_size[1],
                                  rank[1], self.src_rank[1])))

    # -- padded canonical layout ---------------------------------------------
    @property
    def max_local_nr_tiles(self) -> Tuple[int, int]:
        """Tiles per rank in the padded canonical shard layout (same on all
        ranks): ceil(nr_tiles / grid)."""
        mt, nt = self.nr_tiles
        return (ix.ceil_div(max(mt, 1), self.grid_size[0]),
                ix.ceil_div(max(nt, 1), self.grid_size[1]))

    @property
    def padded_size(self) -> Tuple[int, int]:
        """Global size rounded up so every rank holds the same number of full
        tiles — the shape of the canonical dense layout."""
        lmt, lnt = self.max_local_nr_tiles
        return (lmt * self.grid_size[0] * self.block_size[0],
                lnt * self.grid_size[1] * self.block_size[1])

    def sub_distribution(self, offset: Tuple[int, int],
                         size: Tuple[int, int]) -> "Distribution":
        """Distribution of the sub-matrix starting at tile-aligned element
        ``offset`` (reference ``matrix/distribution.h:59-63,206-213``)."""
        oi, oj = offset
        mb, nb = self.block_size
        if oi % mb or oj % nb:
            raise ValueError("sub_distribution offset must be tile-aligned")
        ot = (oi // mb, oj // nb)
        src = (ix.rank_global_tile(ot[0], self.grid_size[0], self.src_rank[0]),
               ix.rank_global_tile(ot[1], self.grid_size[1], self.src_rank[1]))
        return Distribution(size, self.block_size, self.grid_size, src)
