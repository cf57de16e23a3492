"""
Symbolic Pauli-string operators and their algebra.

An Operator holds an MSC term list plus a registry of (left, right) subspace
pairs; for each pair it compiles (and caches) a matrix-free matvec kernel
(:class:`dynamite_tpu.ops.apply.OperatorKernel`) — the analog of the
reference's per-subspace-pair PETSc shell matrices
(reference: src/dynamite/operators.py).
"""

import re
import warnings
from string import ascii_lowercase
from zlib import crc32

import numpy as np

from . import config
from .utils import validate
from .utils.bitwise import parity
from .ops import msc as msc_tools
from .computations import evolve, eigsolve
from .subspaces import Full, Explicit, XParity
from .states import State


class Operator:
    """A quantum operator: a sum of coefficiented Pauli strings.

    Usually built via the factory functions in this module (sigmax, op_sum,
    index_sum, ...) rather than instantiated directly.
    """

    def __init__(self, msc=None, string_rep=None):
        self._max_spin_idx = None
        self._kernels = {}
        self._norm_cache = {}
        self._is_reduced = False
        self._shell = config.shell
        self._precompute_diagonal = True
        self._allow_projection = False
        self._msc = None

        if msc is not None:
            self.msc = msc

        if config.subspace is not None:
            self._subspaces = [(config.subspace, config.subspace)]
        else:
            self._subspaces = [(Full(), Full())]

        if config.L is not None:
            self.L = config.L

        if string_rep is None:
            string_rep = _StringRep()
        self._string_rep = string_rep

    def copy(self):
        """A copy of the operator (without its compiled kernels)."""
        rtn = Operator()
        rtn.msc = self.msc.copy()
        rtn.is_reduced = self.is_reduced
        rtn.shell = self.shell
        rtn.allow_projection = self.allow_projection
        if self._subspaces:
            for left, right in self.get_subspace_list():
                rtn.add_subspace(left, right)
        rtn._string_rep = self._string_rep.copy()
        return rtn

    # computations — bound from computations.py
    evolve = evolve
    eigsolve = eigsolve

    # -- length and dimensions -------------------------------------------------

    @property
    def max_spin_idx(self):
        """Largest spin index on which the operator has support."""
        if self._max_spin_idx is None:
            self._max_spin_idx = (0 if self.msc is None
                                  else msc_tools.max_spin_idx(self.msc))
        return self._max_spin_idx

    @property
    def L(self):
        """The spin chain length."""
        self._update_L_from_subspaces()
        return self.left_subspace.L

    def _update_L_from_subspaces(self):
        L = None
        for pair in self._subspaces:
            for subspace in pair:
                if subspace.L is not None:
                    if L is None:
                        L = subspace.L
                    elif L != subspace.L:
                        raise ValueError('All subspaces of an operator must '
                                         'have the same spin chain length L.')
        if L is not None:
            self.L = L

    @L.setter
    def L(self, value):
        value = validate.L(value)
        if value < self.max_spin_idx + 1:
            raise ValueError('Cannot set L smaller than one plus the '
                             'largest spin index on which the operator has '
                             f'support (max_spin_idx = {self.max_spin_idx})')
        for left, right in self._subspaces:
            left.L = value
            right.L = value

    def establish_L(self):
        """Set L to the minimal possible value if it isn't set yet."""
        self.L = self.get_length()

    def get_length(self):
        """L if set, else one plus the largest supported spin index."""
        if self.L is None:
            return self.max_spin_idx + 1
        return self.L

    @property
    def dim(self):
        """(left, right) matrix dimensions."""
        self.establish_L()
        return (self.left_subspace.get_dimension(),
                self.right_subspace.get_dimension())

    @property
    def nnz(self):
        """Nonzero elements per row (= number of distinct masks)."""
        return msc_tools.nnz_per_row(self.msc)

    @property
    def nterms(self):
        """Number of terms in the reduced Pauli-string sum."""
        self.reduce_msc()
        return len(self.msc)

    @property
    def msc_size(self):
        """(deprecated) use nterms"""
        warnings.warn('Operator.msc_size is deprecated, use Operator.nterms '
                      'instead', DeprecationWarning, stacklevel=2)
        return self.nterms

    @property
    def density(self):
        """nnz per row / row length (an upper bound on subspaces)."""
        return self.nnz / self.dim[1]

    # -- flags -------------------------------------------------------------------

    @property
    def shell(self):
        """API parity flag: on TPU all operators are matrix-free (shell)."""
        return self._shell

    @shell.setter
    def shell(self, value):
        value = validate.shell(value)
        if value != self._shell:
            self.destroy_mat()
        self._shell = value

    @property
    def precompute_diagonal(self):
        """API parity flag (the diagonal term group is always fused)."""
        return self._precompute_diagonal

    @precompute_diagonal.setter
    def precompute_diagonal(self, value):
        self._precompute_diagonal = bool(value)

    @property
    def allow_projection(self):
        """Whether to allow subspace pairs for which applying the operator
        implements a projection (the subspace isn't conserved)."""
        return self._allow_projection

    @allow_projection.setter
    def allow_projection(self, value):
        self._allow_projection = bool(value)

    # -- subspace registry ----------------------------------------------------------

    @property
    def left_subspace(self):
        return self.get_subspace_list()[-1][0]

    @property
    def right_subspace(self):
        return self.get_subspace_list()[-1][1]

    @property
    def subspace(self):
        """The default subspace (most recently added)."""
        if self.left_subspace != self.right_subspace:
            raise ValueError('Left and right subspaces are different for '
                             'this operator. Use Operator.left_subspace and '
                             'Operator.right_subspace to access them '
                             'individually.')
        return self.left_subspace

    @subspace.setter
    def subspace(self, value):
        self.add_subspace(value, value)

    def add_subspace(self, left, right=None):
        """Register a (left, right) subspace pair the operator can act on."""
        if right is None:
            right = left
        elif (left is not right and
              (not left.product_state_basis or not right.product_state_basis)):
            raise ValueError('subspaces must be the same object if either is '
                             'not a product state basis')

        left = validate.subspace(left)
        right = validate.subspace(right)

        if self.L is None:
            if left.L is not None:
                self.L = left.L
            elif right.L is not None:
                self.L = right.L

        if self.L is not None:
            for subspace in (left, right):
                if subspace.L is None:
                    subspace.L = self.L
                elif subspace.L != self.L:
                    raise ValueError('operator and subspaces must all have '
                                     'same spin chain length')

        if not self.has_subspace(left, right):
            self.get_subspace_list().append((left, right))

    def get_subspace_list(self):
        self._update_L_from_subspaces()
        return self._subspaces

    def has_subspace(self, left, right=None):
        if right is None:
            right = left
        for (ls, rs) in self.get_subspace_list():
            if left.identical(ls) and right.identical(rs):
                return True
        return False

    # -- conservation check ------------------------------------------------------------

    def conserves(self, left, right=None):
        """Whether the image of the right subspace under the operator lies
        inside the left subspace — a device reduction over the same term
        sweep as the matvec (reference analog: the distributed shell
        CheckConserves, bpetsc_template_2.c:990-1056)."""
        msc, base_left, base_right, early = self._conserves_prep(left, right)
        if early is not None:
            return early

        from .ops.reductions import build_check_conserves
        config._initialize()
        check = build_check_conserves(msc, base_left, base_right,
                                      config.real_dtype,
                                      self._plan_int_dtype())
        return bool(check())

    def _plan_int_dtype(self):
        return np.int32 if self.L <= 31 else np.int64

    def _conserves_prep(self, left, right):
        """Shared setup for the device and host conservation checks.
        Returns (msc, base_left, base_right, early_result)."""
        self.establish_L()

        if right is None:
            right = left

        if not left.product_state_basis or not right.product_state_basis:
            if left is not right:
                raise ValueError('if left or right subspace is not a product '
                                 'state basis, they must be the same object')

        left.L = self.L
        right.L = self.L

        self.reduce_msc()
        if not left.product_state_basis:
            msc, conserved = left.reduce_msc(self.msc, check_conserves=True)
            if not conserved:
                return None, None, None, False
        else:
            msc = self.msc

        base_left = left.parent if isinstance(left, XParity) else left
        base_right = right.parent if isinstance(right, XParity) else right

        # Full left always contains every image state
        if isinstance(base_left, Full):
            return msc, base_left, base_right, True

        return msc, base_left, base_right, None

    def _conserves_host(self, left, right=None):
        """Host numpy version of :meth:`conserves` — the small-dimension
        oracle for the device reduction."""
        msc, base_left, base_right, early = self._conserves_prep(left, right)
        if early is not None:
            return early

        masks, offsets = msc_tools.mask_groups(msc)
        signs = msc['signs']
        coeffs = msc['coeffs']
        dim = base_right.get_dimension()

        # per-column coefficient totals that cancel analytically can leave
        # float roundoff (e.g. in symbolically-squared operators); treat
        # them as zero relative to each group's coefficient scale
        group_scale = np.add.reduceat(np.abs(coeffs), offsets[:-1])
        tol = 1e-12 * group_scale

        block = 1 << 14
        for start in range(0, dim, block):
            stop = min(start + block, dim)
            cols = np.arange(start, stop, dtype=np.int64)
            states = base_right.idx_to_state(cols)
            sgn = 1 - 2 * parity(states[:, None] & signs[None, :])
            totals = np.add.reduceat(sgn * coeffs[None, :], offsets[:-1],
                                     axis=1)
            for g, m in enumerate(masks):
                active = np.abs(totals[:, g]) > tol[g]
                if not np.any(active):
                    continue
                images = states[active] ^ m
                if np.any(base_left.state_to_idx(images) == -1):
                    return False
        return True

    # -- text representations ------------------------------------------------------------

    def __str__(self):
        return self._string_rep.string

    def __repr__(self):
        return self._string_rep.repr_str

    def _repr_latex_(self):
        return '$' + self._string_rep.get_latex() + '$'

    def table(self):
        """ASCII table of the operator's terms."""
        return msc_tools.table(self.msc, self.get_length())

    # -- serialization ------------------------------------------------------------

    def serialize(self):
        """Serialize just the MSC term list to bytes (byte-compatible with
        the reference format)."""
        return msc_tools.serialize(self.msc)

    @classmethod
    def from_bytes(cls, data):
        return Operator(
            msc=msc_tools.deserialize(data),
            string_rep=_StringRep(
                string='[operator from bytes]',
                tex=r'\left[\text{operator from bytes}\right]',
                repr_str='<Operator from bytes>'))

    def save(self, filename):
        import jax
        if jax.process_index() == 0:
            with open(filename, 'wb') as f:
                f.write(self.serialize())
        # other processes must not read the file before it is written
        from .parallel import multihost
        multihost.barrier('operator_save')

    @classmethod
    def load(cls, filename):
        with open(filename, 'rb') as f:
            return cls.from_bytes(f.read())

    # -- kernel (matrix) management ------------------------------------------------------------

    def get_mat(self, subspaces=None):
        """Get (building if needed) the compiled matvec kernel for a
        subspace pair — the analog of the reference's PETSc matrix."""
        if subspaces is None:
            subspaces = (self.left_subspace, self.right_subspace)
        if subspaces not in self._kernels:
            self.build_mat(subspaces)
        return self._kernels[subspaces]

    def build_mat(self, subspaces=None):
        """Compile the matvec kernel for a subspace pair and cache it."""
        from .ops.apply import OperatorKernel

        if subspaces is None:
            subspaces = (self.left_subspace, self.right_subspace)

        if not self.has_subspace(*subspaces):
            raise ValueError('Attempted to build matrix for a subspace that '
                             'has not been added to the operator.')

        config._initialize()

        self.reduce_msc()

        if not subspaces[0].product_state_basis:
            msc = subspaces[0].reduce_msc(self.msc)
        else:
            msc = self.msc

        self._check_consistent_msc(msc)

        if not self.allow_projection and not self.conserves(*subspaces):
            raise ValueError("Constructing the operator's matrix on this "
                             'subspace yields a projection (e.g. subspace '
                             'is not conserved by the operator). If this '
                             'behavior is desired, set the '
                             'Operator.allow_projection parameter to True.')

        if not msc_tools.is_hermitian(msc):
            raise ValueError('Building non-Hermitian matrices currently not '
                             'supported.')

        self._kernels[subspaces] = OperatorKernel(
            msc, subspaces[0], subspaces[1], mesh=config.mesh)

    @classmethod
    def _check_consistent_msc(cls, msc):
        """Check the operator is identical on every host process (the analog
        of the reference's cross-rank CRC check, operators.py:633-651)."""
        import jax
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils
        checksum = np.array([crc32(msc.tobytes())], dtype=np.uint32)
        all_sums = multihost_utils.process_allgather(checksum)
        if not np.all(all_sums == all_sums.flat[0]):
            raise RuntimeError(
                'operator is inconsistent across host processes. Was it '
                'constructed using non-deterministic code, such as random '
                'numbers with inconsistent seeds?')

    def destroy_mat(self, subspaces=None):
        """Drop cached kernels (freeing compiled executables)."""
        if subspaces is not None:
            self._kernels.pop(subspaces, None)
        else:
            self._kernels.clear()

    def estimate_memory(self, mpi_size=None):
        """Estimated device memory (GB) used when applying the operator —
        everything is matrix-free, so this is the MSC metadata plus any
        Explicit subspace tables, per device (cf. reference shell-mode
        formula, operators.py:692-758)."""
        if mpi_size is None:
            from .parallel.mesh import n_devices
            try:
                mpi_size = n_devices()
            except Exception:
                mpi_size = 1

        usage = self.msc.nbytes
        for sp in (self.left_subspace, self.right_subspace):
            if isinstance(sp, Explicit):
                usage += sp.state_map.nbytes
                usage += sp.rmap_states.nbytes
                if sp.rmap_indices is not None:
                    usage += sp.rmap_indices.nbytes
        usage *= mpi_size
        return usage / 1e9

    # -- applying ------------------------------------------------------------

    def create_states(self):
        """A (bra, ket) pair compatible with this operator."""
        self.establish_L()
        return (State(subspace=self.left_subspace),
                State(subspace=self.right_subspace))

    def dot(self, x, result=None):
        """y = A @ x for a State x."""
        x.assert_initialized()
        self.establish_L()

        right_subspace = x.subspace
        right_match = [(l, r) for l, r in self.get_subspace_list()
                       if r.identical(right_subspace)]
        if not right_match:
            raise ValueError('No operator subspace found that matches input '
                             'vector subspace. Try adding the subspace with '
                             'the Operator.add_subspace method.')

        if result is None:
            if len(right_match) != 1:
                raise ValueError('Ambiguous subspace for result vector. Pass '
                                 'a state with the desired subspace as the '
                                 '"result" option to Operator.dot.')
            left_subspace = right_match[0][0]
            result = State(L=left_subspace.L, subspace=left_subspace)
        else:
            left_subspace = result.subspace

        if (left_subspace, right_subspace) not in right_match:
            raise ValueError('Subspaces of matrix and result vector do not '
                             'match.')

        kernel = self.get_mat(subspaces=(left_subspace, right_subspace))
        result.data = kernel.apply(x.data)
        result.set_initialized()
        return result

    def expectation(self, state, tmp_state=None):
        """<state| A |state> (real part; operators are Hermitian)."""
        if tmp_state is None:
            tmp_state = self.dot(state)
        else:
            self.dot(state, result=tmp_state)
        return state.dot(tmp_state).real

    def infinity_norm(self, subspaces=None):
        """The matrix infinity norm max_row sum_col |A[row, col]|.

        Computed matrix-free on device: one fused pass over rows evaluating
        sum_m |f_m(bra)| (each mask contributes one element per row),
        reduced with max — the same term sweep as the matvec kernel
        (reference analog: the distributed shell MatNorm,
        bpetsc_template_2.c:906-981). The result is cached per subspace
        pair, like the reference caches it in the shell context.
        """
        if subspaces is None:
            subspaces = (self.left_subspace, self.right_subspace)
        if subspaces in self._norm_cache:
            return self._norm_cache[subspaces]
        self.establish_L()
        self.reduce_msc()

        if not subspaces[0].product_state_basis:
            msc = subspaces[0].reduce_msc(self.msc)
        else:
            msc = self.msc

        from .ops.reductions import build_infinity_norm
        config._initialize()
        norm_fn = build_infinity_norm(msc, subspaces[0], subspaces[1],
                                      config.real_dtype,
                                      self._plan_int_dtype())
        result = float(norm_fn())
        self._norm_cache[subspaces] = result
        return result

    def _infinity_norm_host(self, subspaces=None):
        """Host numpy version of :meth:`infinity_norm` — the
        small-dimension oracle for the device reduction."""
        if subspaces is None:
            subspaces = (self.left_subspace, self.right_subspace)
        self.establish_L()
        self.reduce_msc()

        if not subspaces[0].product_state_basis:
            msc = subspaces[0].reduce_msc(self.msc)
        else:
            msc = self.msc

        masks, offsets = msc_tools.mask_groups(msc)
        signs = msc['signs']
        coeffs = msc['coeffs']

        left, right = subspaces
        base_left = left.parent if isinstance(left, XParity) else left
        base_right = right.parent if isinstance(right, XParity) else right
        dim = left.get_dimension()

        best = 0.0
        block = 1 << 16
        for start in range(0, dim, block):
            stop = min(start + block, dim)
            rows = np.arange(start, stop, dtype=np.int64)
            kets = base_left.idx_to_state(rows)
            row_sum = np.zeros(stop - start)
            for g, m in enumerate(masks):
                sl = slice(offsets[g], offsets[g + 1])
                bra = kets ^ m
                sgn = 1 - 2 * parity(bra[:, None] & signs[None, sl])
                elem = np.abs(sgn @ coeffs[sl])
                # entries whose column falls outside the right subspace are
                # projected away (reference: the shell MatNorm only sums
                # in-subspace columns, bpetsc_template_2.c:906-981)
                valid = base_right.state_to_idx(bra) >= 0
                row_sum += np.where(valid, elem, 0.0)
            best = max(best, float(row_sum.max(initial=0.0)))
        return best

    # -- MSC management ------------------------------------------------------------

    @property
    def msc(self):
        """The (mask, sign, coefficient) term list."""
        return self._msc

    @msc.setter
    def msc(self, value):
        value = validate.msc(value)
        self._max_spin_idx = None
        self.is_reduced = False
        self._norm_cache.clear()
        self._msc = value

    def reduce_msc(self):
        """Combine and sort the MSC terms."""
        if not self.is_reduced:
            self.msc = msc_tools.combine_terms(self.msc)
            self.is_reduced = True

    @property
    def is_reduced(self):
        return self._is_reduced

    @is_reduced.setter
    def is_reduced(self, value):
        self._is_reduced = value

    def get_shifted_msc(self, shift, wrap_idx=None):
        """The MSC term list translated along the chain by ``shift``."""
        return msc_tools.shift(self.msc, shift, wrap_idx)

    def truncate(self, tol=1e-12):
        """Drop terms with |coefficient| < tol."""
        self.msc = msc_tools.truncate(self.msc, tol=tol)

    # -- numpy interface ------------------------------------------------------------

    def to_numpy(self, subspaces=None, sparse=True):
        """The operator as a scipy sparse (or dense numpy) matrix — the
        debugging/oracle path."""
        self.establish_L()
        if subspaces is None:
            subspaces = (self.left_subspace, self.right_subspace)
        self.reduce_msc()

        if not subspaces[0].product_state_basis:
            msc = subspaces[0].reduce_msc(self.msc)
        else:
            msc = self.msc

        return msc_tools.msc_to_matrix(
            msc,
            (subspaces[0].get_dimension(), subspaces[1].get_dimension()),
            subspaces[0].idx_to_state,
            subspaces[1].state_to_idx,
            sparse)

    def spy(self, subspaces=None, max_size=1024):
        """Plot the nonzero structure with matplotlib."""
        if any(d > max_size for d in self.dim):
            raise ValueError('Matrix too big to spy. Either build a smaller '
                             'operator, or adjust the maximum spy size with '
                             'the argument "max_size"')
        from matplotlib import pyplot as plt
        plt.figure()
        dense = np.array((self.to_numpy(subspaces=subspaces) != 0).toarray(),
                         dtype=float)
        plt.imshow(np.log(dense + 1e-9), cmap='Greys')
        plt.show()

    # -- algebra ------------------------------------------------------------

    def __add__(self, x):
        if not isinstance(x, Operator):
            if x == 0:
                return self.copy()
            x = x * identity()
        return self._op_add(x)

    def __radd__(self, x):
        if not isinstance(x, Operator):
            if x == 0:
                return self.copy()
            x = x * identity()
        return x + self

    def __sub__(self, x):
        return self + -x

    def __rsub__(self, x):
        return x + -self

    def __neg__(self):
        return -1 * self

    def __mul__(self, x):
        if isinstance(x, Operator):
            return self._op_mul(x)
        if isinstance(x, State):
            return self.dot(x)
        return self._num_mul(x)

    def __rmul__(self, x):
        if isinstance(x, State):
            return TypeError('Left vector-matrix multiplication not '
                             'currently supported.')
        return self._num_mul(x)

    def __truediv__(self, x):
        if isinstance(x, Operator):
            raise TypeError('Dividing by Operators not supported.')
        return (1 / x) * self

    def __eq__(self, x):
        if isinstance(x, Operator):
            self.reduce_msc()
            x.reduce_msc()
            return np.array_equal(self.msc, x.msc)
        raise TypeError(f'Equality not supported for types '
                        f'{type(self)} and {type(x)}')

    def _check_compatible(self, other):
        if self.shell != other.shell:
            raise ValueError("Operators must have the same value of the "
                             "'shell' parameter to be combined. To set it "
                             'globally, set dynamite_tpu.config.shell')
        if self.allow_projection != other.allow_projection:
            raise ValueError("Operators must have the same value of the "
                             "'allow_projection' parameter to be combined.")
        if self.L != other.L:
            raise ValueError('Operators to be combined must have the same '
                             'value of the spin chain length L. To set it '
                             'globally, set dynamite_tpu.config.L')

        subsp_1 = self.get_subspace_list()
        subsp_2 = other.get_subspace_list()
        if len(subsp_1) != len(subsp_2):
            raise ValueError(_SUBSPACE_MISMATCH_MSG)
        for (l1, r1) in subsp_1:
            if not any(l1.identical(l2) and r1.identical(r2)
                       for (l2, r2) in subsp_2):
                raise ValueError(_SUBSPACE_MISMATCH_MSG)

    def _op_add(self, o):
        self._check_compatible(o)
        rtn = self.copy()
        rtn.msc = msc_tools.msc_sum([self.msc, o.msc])
        rtn._string_rep.string = f'{self} + {o}'
        rtn._string_rep.tex = f'{self._string_rep.tex} + {o._string_rep.tex}'
        rtn._string_rep.repr_str = f'{self!r} + {o!r}'
        rtn._string_rep.brackets = '()'
        return rtn

    def _op_mul(self, o):
        self._check_compatible(o)
        rtn = self.copy()
        rtn.msc = msc_tools.msc_product([self.msc, o.msc])
        sw = self._string_rep.with_brackets
        ow = o._string_rep.with_brackets
        rtn._string_rep.string = sw('string') + '*' + ow('string')
        rtn._string_rep.tex = sw('tex') + ow('tex')
        rtn._string_rep.repr_str = sw('repr') + '*' + ow('repr')
        rtn._string_rep.brackets = ''
        return rtn

    def scale(self, x):
        """Scale the operator in place by a number."""
        if x == 1:
            return
        try:
            self.msc['coeffs'] *= x
        except (ValueError, TypeError):
            raise TypeError(f'Cannot scale operator by type {type(x)}')
        # compiled kernels and cached norms bake in the coefficients
        self.destroy_mat()
        self._norm_cache.clear()
        coeff_str = msc_tools.format_coeff(x, parens=True)
        sw = self._string_rep.with_brackets
        self._string_rep.string = f'{coeff_str}*{sw("string")}'
        self._string_rep.tex = coeff_str + sw('tex')
        self._string_rep.repr_str = f'{coeff_str}*{sw("repr")}'
        self._string_rep.brackets = ''

    def _num_mul(self, x):
        rtn = self.copy()
        rtn.scale(x)
        return rtn


_SUBSPACE_MISMATCH_MSG = (
    'Operators to be combined must have the same subspaces. To set a global '
    'default subspace, set dynamite_tpu.config.subspace')


# -- factory functions ------------------------------------------------------------

def sigmax(i=0):
    r"""The Pauli :math:`\sigma_x` operator on site i."""
    i = validate.spin_index(i)
    return Operator(
        msc=[(1 << i, 0, 1)],
        string_rep=_StringRep(tex=r'\sigma^x_{IDX' + str(i) + '}',
                              string=f'σx[{i}]',
                              repr_str=f'sigmax({i})'))


def sigmay(i=0):
    r"""The Pauli :math:`\sigma_y` operator on site i."""
    i = validate.spin_index(i)
    return Operator(
        msc=[(1 << i, 1 << i, 1j)],
        string_rep=_StringRep(tex=r'\sigma^y_{IDX' + str(i) + '}',
                              string=f'σy[{i}]',
                              repr_str=f'sigmay({i})'))


def sigmaz(i=0):
    r"""The Pauli :math:`\sigma_z` operator on site i."""
    i = validate.spin_index(i)
    return Operator(
        msc=[(0, 1 << i, 1)],
        string_rep=_StringRep(tex=r'\sigma^z_{IDX' + str(i) + '}',
                              string=f'σz[{i}]',
                              repr_str=f'sigmaz({i})'))


def sigma_plus(i=0):
    r""":math:`\sigma_+ = \sigma_x + i\sigma_y` on site i."""
    i = validate.spin_index(i)
    rtn = sigmax(i) + 1j * sigmay(i)
    rtn._string_rep = _StringRep(tex=r'\sigma^+_{IDX' + str(i) + '}',
                                 string=f'σ+[{i}]',
                                 repr_str=f'sigma_plus({i})')
    return rtn


def sigma_minus(i=0):
    r""":math:`\sigma_- = \sigma_x - i\sigma_y` on site i."""
    i = validate.spin_index(i)
    rtn = sigmax(i) - 1j * sigmay(i)
    rtn._string_rep = _StringRep(tex=r'\sigma^-_{IDX' + str(i) + '}',
                                 string=f'σ-[{i}]',
                                 repr_str=f'sigma_minus({i})')
    return rtn


def identity():
    """The identity operator."""
    return Operator(msc=[(0, 0, 1)],
                    string_rep=_StringRep(tex='𝟙', string='1',
                                          repr_str='identity()'))


def zero():
    """The zero operator."""
    return Operator(msc=[],
                    string_rep=_StringRep(tex='0', string='0',
                                          repr_str='zero()'))


def op_sum(terms, nshow=3):
    """The sum of an iterable of operators."""
    msc_terms = []
    strings, texs, repr_strs = [], [], []
    ellipsis = False
    for n, t in enumerate(terms):
        msc_terms.append(t.msc)
        repr_strs.append(t._string_rep.repr_str)
        if n < nshow:
            strings.append(t._string_rep.string)
            texs.append(t._string_rep.tex)
        else:
            ellipsis = True
    if ellipsis:
        strings.append('...')
        texs.append(r'\cdots')

    return Operator(
        msc=msc_tools.msc_sum(msc_terms),
        string_rep=_StringRep(string=' + '.join(strings),
                              tex=' + '.join(texs),
                              repr_str=' + '.join(repr_strs),
                              brackets='()'))


def op_product(terms):
    """The product of an iterable of operators."""
    msc_terms = []
    strings, texs, repr_strs = [], [], []
    for t in terms:
        msc_terms.append(t.msc)
        strings.append(t._string_rep.with_brackets('string'))
        texs.append(t._string_rep.with_brackets('tex'))
        repr_strs.append(t._string_rep.with_brackets('repr'))

    if not msc_terms:
        return identity()

    return Operator(
        msc=msc_tools.msc_product(msc_terms),
        string_rep=_StringRep(string='*'.join(strings),
                              tex=''.join(texs),
                              repr_str='*'.join(repr_strs),
                              brackets=''))


def index_sum(op, size=None, start=0, boundary='open'):
    """Translate ``op`` along the chain and sum the copies.

    boundary='open' places copies while they fit; 'closed' wraps around
    (periodic).
    """
    if size is None:
        if op.L is None:
            raise ValueError('Must specify index_sum size with either the '
                             '"size" argument or by setting Operator.L '
                             '(possibly through config.L).')
        default_size = True
        size = op.L
    else:
        default_size = False

    size = validate.L(size)

    if boundary == 'open':
        stop = start + size - op.max_spin_idx
        if stop <= start:
            raise ValueError(f'requested size {size} for sum operator\'s '
                             'support smaller than summand\'s support '
                             f'{op.max_spin_idx}; impossible to satisfy')
        wrap_idx = None
    elif boundary == 'closed':
        stop = start + size
        wrap_idx = stop
        if start != 0:
            raise ValueError('cannot set start != 0 for closed boundary '
                             'conditions.')
    else:
        raise ValueError("invalid value for argument 'boundary' "
                         "(can be 'open' or 'closed')")

    rep = _StringRep()
    rep.string = f'index_sum({op}, sites {start}-{stop - 1}'
    rep.repr_str = f'index_sum({op!r}'
    if not default_size:
        rep.repr_str += f', size={size}'
    if start != 0:
        rep.repr_str += f', start={start}'
    if boundary == 'closed':
        rep.string += ', wrapped'
        rep.repr_str += ', boundary="closed"'
    rep.string += ')'
    rep.repr_str += ')'

    sub_tex = op._string_rep.with_brackets('tex')
    idx = _next_tex_index(sub_tex)
    sub_tex = sub_tex.replace('{IDX', '{IDX' + idx + '+')
    sub_tex = sub_tex.replace('{IDX' + idx + '+0', '{IDX' + idx)
    rep.tex = (r'\sum\limits_{%s=%d}^{%d}' % (idx, start, stop - 1)) + sub_tex
    rep.brackets = '[]'

    return Operator(
        msc=msc_tools.msc_sum(op.get_shifted_msc(i, wrap_idx)
                              for i in range(start, stop)),
        string_rep=rep)


def index_product(op, size=None, start=0):
    """Translate ``op`` along the chain and multiply the copies."""
    if size is None:
        if op.L is None:
            raise ValueError('Must specify index_product size with either '
                             'the "size" argument or by setting Operator.L '
                             '(possibly through config.L).')
        default_size = True
        size = op.L
    else:
        default_size = False

    if size == 0:
        return identity()

    size = validate.L(size)
    stop = start + size - op.max_spin_idx

    rep = _StringRep(string=f'index_product({op}, sites {start}-{stop - 1})')
    rep.repr_str = f'index_product({op!r}'
    if not default_size:
        rep.repr_str += f', size={size}'
    if start != 0:
        rep.repr_str += f', start={start}'
    rep.repr_str += ')'

    sub_tex = op._string_rep.with_brackets('tex')
    idx = _next_tex_index(sub_tex)
    sub_tex = sub_tex.replace('{IDX', '{IDX' + idx + '+')
    sub_tex = sub_tex.replace('{IDX' + idx + '+0', '{IDX' + idx)
    rep.tex = (r'\prod\limits_{%s=%d}^{%d}' % (idx, start, stop - 1)) + sub_tex
    rep.brackets = '[]'

    return Operator(
        msc=msc_tools.msc_product(op.get_shifted_msc(i, wrap_idx=None)
                                  for i in range(start, stop)),
        string_rep=rep)


def load_from_file(filename):
    """DEPRECATED: use Operator.load"""
    warnings.warn('operators.load_from_file is deprecated; use '
                  'operators.Operator.load', DeprecationWarning, stacklevel=2)
    return Operator.load(filename)


def from_bytes(data):
    """DEPRECATED: use Operator.from_bytes"""
    warnings.warn('operators.from_bytes is deprecated; use '
                  'operators.Operator.from_bytes', DeprecationWarning,
                  stacklevel=2)
    return Operator.from_bytes(data)


def _next_tex_index(tex_str):
    """Pick the next free summation-index letter for nested index_sums."""
    if '{IDX' not in tex_str:
        return 'i'
    max_idx = max(tex_str[m.end()] for m in re.finditer('{IDX', tex_str))
    if max_idx in ascii_lowercase:
        return ascii_lowercase[(ascii_lowercase.find(max_idx) + 1) % 26]
    return 'i'


class _StringRep:
    """String / repr / LaTeX representations of an operator expression."""

    def __init__(self, string=None, tex=None, repr_str=None, brackets=None):
        self._string = string if string is not None else '[operator]'
        self._tex = tex if tex is not None else r'\[\text{operator}\]'
        self._repr_str = repr_str if repr_str is not None else 'Operator()'
        self._brackets = brackets if brackets is not None else ''

    def copy(self):
        return _StringRep(self.string, self.tex, self.repr_str, self.brackets)

    @property
    def string(self):
        return self._string

    @string.setter
    def string(self, value):
        self._string = value

    @property
    def tex(self):
        return self._tex

    @tex.setter
    def tex(self, value):
        self._tex = value

    @property
    def repr_str(self):
        return self._repr_str

    @repr_str.setter
    def repr_str(self, value):
        self._repr_str = value

    @property
    def brackets(self):
        return self._brackets

    @brackets.setter
    def brackets(self, value):
        if value not in ('()', '[]', ''):
            raise ValueError("Brackets must be one of '()', '[]', or ''")
        self._brackets = value

    def with_brackets(self, which):
        if which == 'tex':
            base = self.tex
            brackets = [x + y for x, y in
                        zip((r'\left', r'\right'), self.brackets)]
        elif which == 'string':
            base = self.string
            brackets = self.brackets
        elif which == 'repr':
            base = self.repr_str
            brackets = '()'
        else:
            raise ValueError("which must be 'string', 'tex', or 'repr'.")
        if not self.brackets:
            return base
        return base.join(brackets)

    def get_latex(self):
        return self.tex.replace('{IDX', '{')

    def __repr__(self):
        return (f"_StringRep('{self.string}', '{self.tex}', "
                f"'{self.repr_str}', '{self.brackets}')")
