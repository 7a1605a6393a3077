package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embedding columns.
  *
  * All folds are strict left-to-right with per-element promotion to
  * double, so results are bit-reproducible across engines that fold
  * in the same order — the property the DuckDB oracle relies on.
  * The element-wise ops are native codegen'd kernels
  * ([[VectorUtil]]); `dotComposed`/`normSqComposed`/`l2SqComposed`/
  * `cosineSimComposed` keep the pure-HOF spellings the kernel
  * property specs compare against.
  */
object VectorFunctions {

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Tie-stable fixed-point quantization at `decimals` dp:
    * floor(x·10^d + 0.5)/10^d — four IEEE ops every engine executes
    * identically (the QueryDefs.q6 rule, available here because
    * operators cannot depend on the queries package). Use instead of
    * `round(x, d)` on any many-row float path: round() resolves
    * boundary ties differently across engines (h7's sf1-only bug).
    */
  def quantize(c: Column, decimals: Int): Column = {
    val s = lit(math.pow(10.0, decimals))
    floor(c * s + lit(0.5)) / s
  }

  /** Σ a_i*b_i as a strict left fold in double (native kernel). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct64(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Σ a_i² (left fold, double; native kernel). */
  def normSq(a: Column): Column =
    ColumnBridge.column(NormSq64(ColumnBridge.expression(a)))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Σ (a_i − b_i)² as a strict left fold in double — squared
    * euclidean distance (promotes both sides, so float and double
    * arrays mix safely; native kernel).
    */
  def l2Sq(a: Column, b: Column): Column =
    ColumnBridge.column(
      L2Sq64(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** 64-bit sign code (bit i ⇔ v_i > 0) via the K20 kernel — one
    * compiled loop per vector; see [[graft.functions.SignCode64]] for
    * why the composed 64-term CASE tree is the slow spelling.
    */
  def signCode64(v: Column): Column =
    ColumnBridge.column(SignCode64(ColumnBridge.expression(v)))

  /** Cosine similarity = dot/(‖a‖·‖b‖) over the native fold kernels.
    * The division stays a Spark `Divide` on purpose: under ANSI mode
    * a zero norm raises DIVIDE_BY_ZERO exactly like the composed
    * spelling always did — a fused kernel returning IEEE NaN would
    * silently change that contract.
    */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine of a float/double query against an int8-quantized corpus
    * vector, decoding BYTES in the compiled score loop
    * ([[graft.functions.VectorUtil.sqDot]]/[[graft.functions.VectorUtil.sqNormSq]])
    * — bit-identical to `cosineSim(q, transform(codes, c ->
    * (c·amax)/127))` (spec-pinned) without the interpreted HOF
    * reconstruction per element. Division composition matches
    * [[cosineSim]]: a Spark `Divide`, so ANSI zero-norm behavior is
    * unchanged.
    */
  def sqCosine(q: Column, codes: Column, amax: Column): Column =
    ColumnBridge.column(SqDot64(ColumnBridge.expression(q),
      ColumnBridge.expression(codes), ColumnBridge.expression(amax))) /
      (norm(q) * sqrt(ColumnBridge.column(SqNormSq64(
        ColumnBridge.expression(codes), ColumnBridge.expression(amax)))))

  /** The composed HOF spelling of [[dot]] — kernel-equivalence spec
    * reference.
    */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** The composed HOF spelling of [[normSq]]. */
  def normSqComposed(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** The composed HOF spelling of [[l2Sq]]. */
  def l2SqComposed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0),
      (acc, x) => acc + x)

  /** The composed spelling of [[cosineSim]]. */
  def cosineSimComposed(a: Column, b: Column): Column =
    dotComposed(a, b) / (sqrt(normSqComposed(a)) * sqrt(normSqComposed(b)))

  /** v / ‖v‖ as array<double>. */
  def l2Normalize(a: Column): Column =
    transform(a, x => x.cast("double") / norm(a))

  /** Deterministic pseudo-random hyperplane weight in [-1, 1]:
    * w(plane, i) = ((md5prefix64("plane,i") mod 2001) - 1000)/1000.
    * Seeded from md5 so Spark, the oracle and any other engine agree.
    * The weights are constants, so they are materialized driver-side
    * once (a literal array) instead of re-hashing per row — at 100 TB
    * that saves dim·planes md5 calls per record.
    */
  def hyperplane(plane: Int, dim: Int): Column =
    typedLit((0 until dim).map { i =>
      ((HashUtil.md5Prefix64(s"$plane,$i") % 2001L) - 1000L).toDouble / 1000.0
    })

  /** LSH bucket id from `planes` hyperplane sign bits (bit j set iff
    * dot(v, hp_j) > 0). Buckets partition the space so all-pairs work
    * is Σ bucket² instead of N² — the 100 TB-scale ANN path.
    */
  def lshBucket(v: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { j =>
      when(dot(v, hyperplane(j, dim)) > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic pseudo-random codebook (hyperplane-style md5
    * weights, distinct seed space) — stands in for a trained k-means
    * codebook; swap in real centroids in production.
    */
  def codebook(k: Int, dim: Int): Seq[Array[Double]] =
    (0 until k).map { j =>
      (0 until dim).map { i =>
        ((HashUtil.md5Prefix64(s"c$j,$i") % 2001L) - 1000L).toDouble / 1000.0
      }.toArray
    }

  /** Row j of the Achlioptas (2003) sign-projection matrix: `dim`
    * entries in {+1, −1}, sign = md5 parity of seed "jl{j},{i}" —
    * the Johnson–Lindenstrauss database-friendly construction
    * (±1 entries; the 1/√d' scale is dropped because cosine is
    * invariant to uniform per-vector scaling). Deterministic and
    * engine-replayable like [[hyperplane]]/[[codebook]].
    */
  def jlSignRow(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      if (HashUtil.md5Prefix64(s"jl$j,$i") % 2L == 0L) 1.0 else -1.0
    }

  /** JL random projection d=`dim` → d'=`dOut`: y_j = Σ_i R[j][i]·x_i
    * over the seeded sign matrix — dOut native dot-product folds per
    * row against literal rows (no shuffle, no per-row hashing;
    * row-local like [[lshBucket]]). Output `array<double>`.
    */
  def jlProject(v: Column, dOut: Int, dim: Int): Column =
    array((0 until dOut).map(j => dot(v, typedLit(jlSignRow(j, dim)))): _*)

  /** Deterministic product-quantization codebook for subvector `m`:
    * `k` codewords of `subDim` md5-derived weights (seed space
    * "pq{m},{j},{i}" — same family as [[hyperplane]]/[[codebook]]).
    * Stands in for a trained PQ codebook; swap in k-means-trained
    * codewords ([[graft.operators.Embeddings.kmeansLloyd]]) in
    * production.
    */
  def pqCodebook(m: Int, k: Int, subDim: Int): Seq[Array[Double]] =
    (0 until k).map { j =>
      (0 until subDim).map { i =>
        ((HashUtil.md5Prefix64(s"pq$m,$j,$i") % 2001L) - 1000L).toDouble / 1000.0
      }.toArray
    }

  /** PQ code of subvector `m` over an EXPLICIT literal codebook —
    * argmin-l2 codeword index as a row-local fold (no row expansion,
    * no aggregation — the same 100 TB shape as [[ivfCellFold]]).
    * Strict `<` keeps the FIRST minimal index on exact ties. This is
    * the "swap in trained codewords" seam: feed it
    * `Embeddings.trainPqCodebooks` output instead of the md5 demo
    * codebook.
    */
  def pqSubCodeFrom(v: Column, cb: Seq[Array[Double]], m: Int, subDim: Int): Column = {
    val cbLit = typedLit(cb.map(_.toSeq))
    val sub = slice(v, m * subDim + 1, subDim)
    argminL2(sub, cbLit).getField("j")
  }

  /** Row-local argmin-by-l2 over a candidate array as ONE compiled
    * pass (native kernel, struct(j, d) result) — the assignment
    * inner loop of PQ encoding and k-means; fold semantics preserved
    * exactly (first minimal index on ties, null distances skipped,
    * (-1, +Inf) on empty candidates).
    */
  def argminL2(v: Column, candidates: Column): Column =
    ColumnBridge.column(ArgminL2Indexed(
      ColumnBridge.expression(v), ColumnBridge.expression(candidates)))

  /** [[pqSubCodeFrom]] over the deterministic md5 demo codebook. */
  def pqSubCode(v: Column, m: Int, k: Int, subDim: Int): Column =
    pqSubCodeFrom(v, pqCodebook(m, k, subDim), m, subDim)

  /** Asymmetric (ADC) PQ distance over EXPLICIT per-subvector
    * codebooks: Σ_m ‖q_m − codeword(m, code_m)‖². The query stays
    * exact; the candidate is represented only by its codes — 4-bit
    * codes compress a 64-float vector to 2 bytes, the memory ratio
    * that lets billion-vector indexes live in RAM.
    */
  def pqAdcDistFrom(q: Column, codes: Column, cbs: Seq[Seq[Array[Double]]],
                    subDim: Int): Column =
    cbs.zipWithIndex.map { case (cb, m) =>
      val cbLit = typedLit(cb.map(_.toSeq))
      l2Sq(slice(q, m * subDim + 1, subDim),
        element_at(cbLit, element_at(codes, m + 1) + 1))
    }.reduce(_ + _)

  /** [[pqAdcDistFrom]] over the md5 demo codebooks. */
  def pqAdcDist(q: Column, codes: Column, mSub: Int, k: Int, subDim: Int): Column =
    pqAdcDistFrom(q, codes,
      (0 until mSub).map(m => pqCodebook(m, k, subDim)), subDim)

  /** IVF cell assignment as a row-local fold over a LITERAL codebook —
    * the 100 TB path. The DataFrame-based `Embeddings.ivfAssign`
    * expands every row ×k through a broadcast cross join and
    * re-collapses with an aggregation (a sort at scale, since argmax
    * buffers aren't hash-aggregable); this version never expands:
    * one pass over the codebook array per row, tracking the best
    * (score, index) in a struct accumulator. Ranking by
    * dot(v,c)/‖c‖ ≡ ranking by cosine (‖v‖ is a common positive
    * factor), so the division by ‖v‖ is skipped; centroid norms are
    * driver-side constants. Strict `>` keeps the LOWEST index on
    * exact ties — the same tie-break as ivfAssign's max_by. Runs as
    * the native [[ArgmaxDotNormIndexed]] kernel (one compiled pass
    * per row); the score division is plain IEEE inside the kernel —
    * a zero-norm centroid would yield ±Inf/NaN scores instead of the
    * old fold's ANSI DIVIDE_BY_ZERO, a corner no real codebook hits
    * (norms are of trained means or md5 weights, never zero).
    */
  def ivfCellFold(v: Column, cb: Seq[Array[Double]]): Column = {
    val cbLit = typedLit(cb.map(_.toSeq))
    val normLit = typedLit(cb.map(c => math.sqrt(c.map(x => x * x).sum)))
    ColumnBridge.column(ArgmaxDotNormIndexed(
      ColumnBridge.expression(v), ColumnBridge.expression(cbLit),
      ColumnBridge.expression(normLit))).getField("i")
  }

  /** The `nprobe` nearest cells of a LITERAL codebook, as an int
    * array — the multi-probe counterpart of [[ivfCellFold]], still
    * fully row-local (score every centroid once, sort the k-element
    * struct array, slice). Ranking score and tie-break (higher
    * dot/‖c‖ first, lower index on ties) match [[ivfCellFold]]
    * exactly, so probing with nprobe=1 reproduces the fold
    * assignment. Meant for the tiny QUERY side of an IVF join — the
    * corpus keeps its single fold-assigned cell.
    */
  def ivfProbeCells(v: Column, cb: Seq[Array[Double]], nprobe: Int): Column = {
    val cbLit = typedLit(cb.map(_.toSeq))
    val normLit = typedLit(cb.map(c => math.sqrt(c.map(x => x * x).sum)))
    val scored = transform(sequence(lit(0), lit(cb.length - 1)), i =>
      struct(
        (-(dot(v, element_at(cbLit, i + 1)) / element_at(normLit, i + 1))).as("ns"),
        i.as("i")))
    transform(slice(array_sort(scored), 1, nprobe), s => s.getField("i"))
  }
}
