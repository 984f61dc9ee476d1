-- DuckDB oracle SQL for the 'media' query family, one '-- ::<key>' section
-- per oracle; loaded by graft.Oracles at registration ({{...}} = substitution,
-- see Oracles.scala scaladoc). Generated SQL stays in the family's Scala file.
-- ::videoMeta
SELECT doc_id,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
    ELSE 'avc1' END AS brand,
  CAST(1000 + doc_id % 9000 AS BIGINT) AS duration_ms,
  CAST(320 + (doc_id % 8) * 80 AS INT) AS width,
  CAST(240 + (doc_id % 6) * 60 AS INT) AS height,
  CAST(24 + doc_id % 240 AS INT) AS n_frames,
  CAST({{e1}} + 100 + doc_id % 50 AS BIGINT) AS byte_len
FROM documents

-- ::videoFrames
WITH f AS (
  SELECT doc_id, CAST(3 + doc_id % 6 AS INT) AS nf,
    unnest(range(0, least(4, CAST(ceil((3 + doc_id % 6) / 2.0) AS BIGINT)))) AS s
  FROM documents
)
SELECT doc_id,
  CAST(s * 2 AS INT) AS frame_idx,
  48 AS width, 32 AS height,
  nf AS n_frames,
  CAST(least(4, CAST(ceil(nf / 2.0) AS BIGINT)) AS INT) AS n_sampled,
  CAST((doc_id + 3 * (s * 2)) % 8 AS INT) AS gray_bucket
FROM f

-- ::mp4Frames
WITH f AS (
  SELECT doc_id, CAST(3 + doc_id % 6 AS INT) AS nf,
    unnest(range(0, least(3, CAST(ceil((3 + doc_id % 6) / 3.0) AS BIGINT)))) AS s
  FROM documents
)
SELECT doc_id,
  CAST(s * 3 AS INT) AS frame_idx,
  'mp4/mp42' AS format,
  48 AS width, 32 AS height,
  nf AS n_frames,
  CAST(least(3, CAST(ceil(nf / 3.0) AS BIGINT)) AS INT) AS n_sampled,
  CAST((doc_id + 5 * (s * 3)) % 8 AS INT) AS gray_bucket
FROM f

-- ::rawVideo
WITH f AS (
  SELECT doc_id, CAST(3 + doc_id % 5 AS INT) AS nf,
    unnest(range(0, least(4, CAST(ceil((3 + doc_id % 5) / 2.0) AS BIGINT)))) AS s
  FROM documents
)
SELECT doc_id,
  CAST(s * 2 AS INT) AS frame_idx,
  'avi/dib' AS format,
  32 AS width, 24 AS height,
  nf AS n_frames,
  CAST(least(4, CAST(ceil(nf / 2.0) AS BIGINT)) AS INT) AS n_sampled,
  CAST((7 * doc_id + 13 * (s * 2)) % 256 AS INT) AS gray
FROM f

-- ::audioMeta
SELECT doc_id,
  'wav' AS format,
  CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       WHEN 2 THEN 22050 ELSE 44100 END AS INT) AS sample_rate,
  CAST(1 + doc_id % 2 AS INT) AS channels,
  CAST(500 + doc_id % 4000 AS INT) AS n_frames,
  CAST((500 + doc_id % 4000) * 1000
    // (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        WHEN 2 THEN 22050 ELSE 44100 END) AS BIGINT) AS duration_ms,
  CAST(44 + (500 + doc_id % 4000) * (1 + doc_id % 2) * 2 AS BIGINT)
    AS byte_len
FROM documents

-- ::imageDedup
{{e1}},
j AS (
  SELECT d.doc_id, h.dhash FROM docs0 d
  JOIN ihash h ON h.seed = d.iseed)
SELECT doc_id, dhash,
  CAST(COUNT(*) OVER (PARTITION BY dhash) AS BIGINT) AS group_n,
  (COUNT(*) OVER (PARTITION BY dhash)) > 1 AS is_near_dup
FROM j

-- ::audioDedup
{{e1}},
j AS (
  SELECT d.doc_id, f.fp FROM docs0 d
  JOIN afp f ON f.seed = d.aseed)
SELECT doc_id, fp,
  CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS group_n,
  (COUNT(*) OVER (PARTITION BY fp)) > 1 AS is_near_dup
FROM j

-- ::crossModalMatrix
{{modalCtes}}
SELECT text_dup, image_dup, audio_dup,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(CAST(COUNT(*) * 1000000 AS BIGINT)
    // CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS BIGINT) AS share_ppm
FROM flags GROUP BY 1, 2, 3

-- ::multimodalCurate
{{modalCtes}}
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN text_keep THEN 1 ELSE 0 END) AS BIGINT)
    AS kept_text,
  CAST(SUM(CASE WHEN image_keep THEN 1 ELSE 0 END) AS BIGINT)
    AS kept_image,
  CAST(SUM(CASE WHEN audio_keep THEN 1 ELSE 0 END) AS BIGINT)
    AS kept_audio,
  CAST(SUM(CASE WHEN text_keep AND image_keep AND audio_keep
    THEN 1 ELSE 0 END) AS BIGINT) AS kept_all,
  CAST(CAST(SUM(CASE WHEN text_keep AND image_keep AND audio_keep
    THEN 1 ELSE 0 END) * 1000000 AS BIGINT) // COUNT(*) AS BIGINT)
    AS retained_ppm
FROM flags GROUP BY source

-- ::h264
WITH f AS (
  SELECT doc_id, CAST(2 + doc_id % 4 AS INT) AS nf,
    unnest(range(0, 2 + doc_id % 4)) AS k
  FROM documents
)
SELECT doc_id,
  CAST(k AS INT) AS frame_idx,
  'h264' AS format,
  48 AS width, 32 AS height,
  nf AS n_frames,
  CAST((11 * doc_id + 17 * k) % 256 AS INT) AS gray
FROM f

-- ::h264Cavlc
WITH base AS (
  SELECT doc_id,
    CAST(20 + doc_id % 12 AS INT) AS qp,
    CAST(doc_id % 7 - 3 AS INT) AS l0,
    CAST(1 + doc_id % 3 AS INT) AS l1,
    CAST(doc_id % 5 - 2 AS INT) AS a1,
    CAST(2 * (doc_id % 2) - 1 AS INT) AS a2,
    CAST(1 + doc_id % 4 AS INT) AS a3,
    CAST(2 - doc_id % 5 AS INT) AS l2,
    CAST(doc_id % 9 - 4 AS INT) AS c0,
    CAST(1 + doc_id % 6 AS INT) AS c1,
    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END AS INT) AS tt,
    CAST((11 * doc_id + 5) % 256 AS INT) AS g0
  FROM documents
), scaled AS (
  SELECT *,
    qp // 6 AS k, qp % 6 AS m, (qp + 1) // 6 AS k1, (qp + 1) % 6 AS m1,
    ([10,11,13,14,16,18])[qp % 6 + 1] AS va,
    ([16,18,20,23,25,29])[qp % 6 + 1] AS vb,
    ([13,14,16,18,20,23])[qp % 6 + 1] AS vc,
    ([10,11,13,14,16,18])[(qp + 1) % 6 + 1] AS va1,
    ([13,14,16,18,20,23])[(qp + 1) % 6 + 1] AS vc1
  FROM base
), px0 AS (
  SELECT *,
    LEAST(255, GREATEST(0,
      128 + CAST(floor((l0 * va * (1 << (k - 2)) + 32) / 64.0) AS BIGINT)
    )) AS v0
  FROM scaled
), px1 AS (
  SELECT *,
    LEAST(255, GREATEST(0, v0 + CAST(floor((
      l1 * va1 * (1 << (k1 - 2)) + a1 * vc1 * (1 << k1)
      + a2 * vc1 * (1 << k1) + a3 * va1 * (1 << k1) + 32) / 64.0) AS BIGINT)
    )) AS p016,
    LEAST(255, GREATEST(0, v0 + CAST(floor((
      l1 * va1 * (1 << (k1 - 2)) + a3 * va1 * (1 << k1)
      - a1 * vc1 * (1 << k1) + a2 * vc1 * (1 << k1) + 32) / 64.0) AS BIGINT)
    )) AS p031
  FROM px0
), px2 AS (
  SELECT *,
    LEAST(255, GREATEST(0, p031 + CAST(floor((
      l2 * va * (1 << (k - 2)) + a2 * vc * (1 << k)
      + a3 * vc * (1 << k) + a1 * va * (1 << k) + 32) / 64.0) AS BIGINT)
    )) AS p032,
    LEAST(255, GREATEST(0,
      128 + CAST(floor((c0 * va * (1 << k) + c1 * vc * (1 << k)
        + tt * vb * (1 << k) + 32) / 64.0) AS BIGINT))) AS p4x4,
    LEAST(255, GREATEST(0,
      g0 + CAST(floor((l0 * va * (1 << (k - 2)) + 32) / 64.0) AS BIGINT)
    )) AS pdc16
  FROM px1
)
SELECT doc_id, p.probe,
  48 AS width, 16 AS height, 2 AS n_frames,
  CAST(CASE p.probe
    WHEN 'f1_mb0' THEN v0
    WHEN 'f1_mb1_c0' THEN p016
    WHEN 'f1_mb1_c15' THEN p031
    WHEN 'f1_mb2' THEN p032
    WHEN 'f2_i4x4' THEN p4x4
    WHEN 'f2_pcm' THEN g0
    WHEN 'f2_dc16' THEN pdc16
  END AS INT) AS px
FROM px2
CROSS JOIN (VALUES ('f1_mb0'), ('f1_mb1_c0'), ('f1_mb1_c15'),
  ('f1_mb2'), ('f2_i4x4'), ('f2_pcm'), ('f2_dc16')) p(probe)

-- ::h264Inter
WITH base AS (
  SELECT doc_id,
    CAST(doc_id % 7 AS INT) AS c,
    CAST(20 + doc_id % 12 AS INT) AS qp,
    CAST(40 + doc_id % 50 AS INT) AS g0,
    CAST(30 + doc_id % 60 AS INT) AS dl,
    CAST(doc_id % 5 - 2 AS INT) AS lvl
  FROM documents
), scaled AS (
  SELECT *,
    qp // 6 AS k,
    ([10,11,13,14,16,18])[qp % 6 + 1] AS va
  FROM base
), forms AS (
  SELECT *,
    CASE c
      WHEN 0 THEN g0 + 30 + dl
      WHEN 1 THEN CAST(floor((32 * (g0 + 29) + 32 + 20 * dl) / 32.0) AS BIGINT)
      WHEN 2 THEN CAST(floor((32 * (g0 + 28) + 48 + 20 * dl) / 32.0) AS BIGINT)
      WHEN 3 THEN CAST(floor((1024 * (g0 + 27) + 2048 + 400 * dl) / 1024.0) AS BIGINT)
      WHEN 4 THEN (g0 + 29
        + CAST(floor((32 * (g0 + 29) + 32 + 20 * dl) / 32.0) AS BIGINT) + 1) // 2
      WHEN 5 THEN (g0 + 28
        + CAST(floor((32 * (g0 + 28) + 48 + 20 * dl) / 32.0) AS BIGINT) + 1) // 2
      WHEN 6 THEN (CAST(floor((32 * (g0 + 28) + 48 + 20 * dl) / 32.0) AS BIGINT)
        + CAST(floor((32 * (g0 + 29) + 32 + 20 * dl) / 32.0) AS BIGINT) + 1) // 2
    END AS v_main,
    CASE c
      WHEN 0 THEN g0 + 29
      WHEN 1 THEN CAST(floor((32 * (g0 + 28) + 32 - 5 * dl) / 32.0) AS BIGINT)
      WHEN 2 THEN CAST(floor((32 * (g0 + 26) + 48 - 5 * dl) / 32.0) AS BIGINT)
      WHEN 3 THEN CAST(floor((1024 * (g0 + 23) + 2048 - 5 * dl) / 1024.0) AS BIGINT)
      WHEN 4 THEN (g0 + 28
        + CAST(floor((32 * (g0 + 28) + 32 - 5 * dl) / 32.0) AS BIGINT) + 1) // 2
      WHEN 5 THEN (g0 + 26
        + CAST(floor((32 * (g0 + 26) + 48 - 5 * dl) / 32.0) AS BIGINT) + 1) // 2
      WHEN 6 THEN g0 + 27
    END AS v_aux,
    CASE c
      WHEN 0 THEN g0 + 65 WHEN 1 THEN g0 + 67 WHEN 2 THEN g0 + 67
      WHEN 3 THEN g0 + 68 WHEN 4 THEN g0 + 67 WHEN 5 THEN g0 + 67
      WHEN 6 THEN g0 + 69
    END AS v_skip,
    CASE c
      WHEN 0 THEN g0 + 72 WHEN 3 THEN g0 + 75 WHEN 6 THEN g0 + 76
      ELSE g0 + 74
    END
    + CAST(floor((lvl * va * (1 << k) + 32) / 64.0) AS BIGINT) AS v_resid
  FROM scaled
)
SELECT doc_id, p.probe,
  48 AS width, 32 AS height, 3 AS n_frames,
  CAST(LEAST(255, GREATEST(0, CASE p.probe
    WHEN 'p_main' THEN v_main
    WHEN 'p_aux' THEN v_aux
    WHEN 'p_skip' THEN v_skip
    WHEN 'p_resid' THEN v_resid
    WHEN 'p_f2' THEN v_resid
  END)) AS INT) AS px
FROM forms
CROSS JOIN (VALUES ('p_main'), ('p_aux'), ('p_skip'), ('p_resid'),
  ('p_f2')) p(probe)

-- ::h264CavlcRef
WITH base AS (
  SELECT doc_id,
    CAST(doc_id % 7 AS INT) AS c,
    CAST(20 + doc_id % 12 AS INT) AS qp,
    CAST(40 + doc_id % 50 AS INT) AS g0,
    CAST(30 + doc_id % 60 AS INT) AS dl,
    CAST(doc_id % 7 - 3 AS INT) AS l0
  FROM documents
), scaled AS (
  SELECT *,
    qp // 6 AS k,
    ([10,11,13,14,16,18])[qp % 6 + 1] AS va
  FROM base
), forms AS (
  SELECT *,
    CASE c
      WHEN 0 THEN g0 + 30 + dl
      WHEN 1 THEN CAST(floor((32 * (g0 + 29) + 32 + 20 * dl) / 32.0) AS BIGINT)
      WHEN 2 THEN CAST(floor((32 * (g0 + 28) + 48 + 20 * dl) / 32.0) AS BIGINT)
      WHEN 3 THEN CAST(floor((1024 * (g0 + 27) + 2048 + 400 * dl) / 1024.0) AS BIGINT)
      WHEN 4 THEN (g0 + 29
        + CAST(floor((32 * (g0 + 29) + 32 + 20 * dl) / 32.0) AS BIGINT) + 1) // 2
      WHEN 5 THEN (g0 + 28
        + CAST(floor((32 * (g0 + 28) + 48 + 20 * dl) / 32.0) AS BIGINT) + 1) // 2
      WHEN 6 THEN (CAST(floor((32 * (g0 + 28) + 48 + 20 * dl) / 32.0) AS BIGINT)
        + CAST(floor((32 * (g0 + 29) + 32 + 20 * dl) / 32.0) AS BIGINT) + 1) // 2
    END AS v_main,
    CASE c
      WHEN 0 THEN g0 + 29
      WHEN 1 THEN CAST(floor((32 * (g0 + 28) + 32 - 5 * dl) / 32.0) AS BIGINT)
      WHEN 2 THEN CAST(floor((32 * (g0 + 26) + 48 - 5 * dl) / 32.0) AS BIGINT)
      WHEN 3 THEN CAST(floor((1024 * (g0 + 23) + 2048 - 5 * dl) / 1024.0) AS BIGINT)
      WHEN 4 THEN (g0 + 28
        + CAST(floor((32 * (g0 + 28) + 32 - 5 * dl) / 32.0) AS BIGINT) + 1) // 2
      WHEN 5 THEN (g0 + 26
        + CAST(floor((32 * (g0 + 26) + 48 - 5 * dl) / 32.0) AS BIGINT) + 1) // 2
      WHEN 6 THEN g0 + 27
    END AS v_aux,
    CASE c
      WHEN 0 THEN g0 + 65 WHEN 1 THEN g0 + 67 WHEN 2 THEN g0 + 67
      WHEN 3 THEN g0 + 68 WHEN 4 THEN g0 + 67 WHEN 5 THEN g0 + 67
      WHEN 6 THEN g0 + 69
    END AS v_skip,
    g0 + 74
      + CAST(floor((l0 * va * (1 << (k - 2)) + 32) / 64.0) AS BIGINT)
      AS v_intra
  FROM scaled
)
SELECT doc_id, p.probe,
  48 AS width, 32 AS height, 3 AS n_frames,
  CAST(LEAST(255, GREATEST(0, CASE p.probe
    WHEN 'p_main' THEN v_main
    WHEN 'p_aux' THEN v_aux
    WHEN 'p_skip' THEN v_skip
    WHEN 'p_intra' THEN v_intra
    WHEN 'p_f2' THEN v_intra
  END)) AS INT) AS px
FROM forms
CROSS JOIN (VALUES ('p_main'), ('p_aux'), ('p_skip'), ('p_intra'),
  ('p_f2')) p(probe)

-- ::h264Deblock
WITH base AS (
  SELECT doc_id,
    CAST(24 + doc_id % 10 AS INT) AS qp,
    CAST(2 * (doc_id % 3 - 1) AS INT) AS aoff,
    CAST(2 * ((doc_id // 3) % 3 - 1) AS INT) AS boff,
    CAST(doc_id % 5 - 2 AS INT) AS l0,
    CAST(2 * (doc_id % 17 - 8) AS INT) AS l1,
    CAST(1 + doc_id % 6 AS INT) AS lr
  FROM documents
), scaled AS (
  SELECT *,
    qp // 6 AS k,
    ([10,11,13,14,16,18])[qp % 6 + 1] AS va,
    LEAST(51, GREATEST(0, qp + aoff)) AS idxa,
    LEAST(51, GREATEST(0, qp + boff)) AS idxb
  FROM base
), tabs AS (
  SELECT *,
    ([0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,4,4,5,6,7,8,9,10,12,13,15,17,
      20,22,25,28,32,36,40,45,50,56,63,71,80,90,101,113,127,144,162,
      182,203,226,255,255])[idxa + 1] AS alpha,
    ([0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,2,2,2,3,3,3,3,4,4,4,6,6,7,7,
      8,8,9,9,10,10,11,11,12,12,13,13,14,14,15,15,16,16,17,17,18,18
      ])[idxb + 1] AS beta,
    ([0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,1,1,1,1,1,1,1,1,1,
      1,2,2,2,2,3,3,3,4,4,5,5,6,7,8,8,10,11,12,13,15,17])[idxa + 1]
      AS tc2,
    ([0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,1,1,1,1,1,1,1,1,1,1,2,2,2,
      2,3,3,3,4,4,4,5,6,6,7,8,9,10,11,13,14,16,18,20,23,25])[idxa + 1]
      AS tc3
  FROM scaled
), vals AS (
  SELECT *,
    LEAST(255, GREATEST(0,
      128 + CAST(floor((l0 * va * (1 << (k - 2)) + 32) / 64.0) AS BIGINT)
    )) AS v0
  FROM tabs
), vals2 AS (
  SELECT *,
    LEAST(255, GREATEST(0,
      v0 + CAST(floor((l1 * va * (1 << (k - 2)) + 32) / 64.0) AS BIGINT)
    )) AS v1,
    (lr * va * (1 << k) + 32) // 64 AS rho
  FROM vals
), stage1 AS (
  SELECT *,
    abs(v1 - v0) < alpha AND abs(v1 - v0) < alpha // 4 + 2 AS strongf,
    abs(v1 - v0) < alpha AND abs(v1 - v0) >= alpha // 4 + 2 AS weakf,
    (7 * v1 + v0 + 4) // 8 AS q2s
  FROM vals2
), stage1b AS (
  SELECT *,
    CASE WHEN strongf THEN (7 * v0 + v1 + 4) // 8 ELSE v0 END AS i13,
    CASE WHEN strongf THEN (3 * v0 + v1 + 2) // 4 ELSE v0 END AS i14,
    CASE WHEN strongf THEN (5 * v0 + 3 * v1 + 4) // 8
         WHEN weakf THEN (3 * v0 + v1 + 2) // 4 ELSE v0 END AS i15,
    CASE WHEN strongf THEN (5 * v1 + 3 * v0 + 4) // 8
         WHEN weakf THEN (3 * v1 + v0 + 2) // 4 ELSE v1 END AS i16,
    CASE WHEN strongf THEN (3 * v1 + v0 + 2) // 4 ELSE v1 END AS i17
  FROM stage1
), stage1c AS (
  SELECT *,
    CASE WHEN strongf AND abs(q2s - v1) < beta AND abs(i17 - v1) < beta
         THEN q2s + LEAST(tc3, GREATEST(-tc3,
           CAST(floor((i17 + v1 - 2 * q2s) / 2.0) AS BIGINT)))
         WHEN strongf THEN q2s
         ELSE v1 END AS i18
  FROM stage1b
), stage2 AS (
  SELECT *,
    v1 + rho AS w,
    rho < alpha AS g2,
    LEAST(tc2 + 2, (3 * rho + 4) // 8) AS d2,
    LEAST(tc2, ((rho + 1) // 2) // 2) AS e2,
    GREATEST(-tc2,
      CAST(floor(((rho + 1) // 2 - rho) / 2.0) AS BIGINT)) AS cc
  FROM stage1c
), stage2b AS (
  SELECT *,
    v1 AS p29,
    CASE WHEN g2 THEN v1 + e2 ELSE v1 END AS p30,
    CASE WHEN g2 THEN v1 + d2 ELSE v1 END AS p31,
    CASE WHEN g2 THEN w - d2 ELSE w END AS p32,
    CASE WHEN g2 THEN w + cc ELSE w END AS p33,
    CASE WHEN g2 AND abs(cc) < beta
         THEN w + GREATEST(-tc2, LEAST(tc2,
           CAST(floor(cc / 2.0) AS BIGINT)))
         ELSE w END AS p34
  FROM stage2
)
SELECT doc_id, p.probe,
  CAST(LEAST(255, GREATEST(0, CASE p.probe
    WHEN 'i_x13' THEN i13 WHEN 'i_x14' THEN i14 WHEN 'i_x15' THEN i15
    WHEN 'i_x16' THEN i16 WHEN 'i_x17' THEN i17 WHEN 'i_x18' THEN i18
    WHEN 'p1_x15' THEN i15 WHEN 'p1_x16' THEN i16
    WHEN 'p2_x29' THEN p29 WHEN 'p2_x30' THEN p30
    WHEN 'p2_x31' THEN p31 WHEN 'p2_x32' THEN p32
    WHEN 'p2_x33' THEN p33 WHEN 'p2_x34' THEN p34
  END)) AS INT) AS px
FROM stage2b
CROSS JOIN (VALUES ('i_x13'), ('i_x14'), ('i_x15'), ('i_x16'),
  ('i_x17'), ('i_x18'), ('p1_x15'), ('p1_x16'), ('p2_x29'),
  ('p2_x30'), ('p2_x31'), ('p2_x32'), ('p2_x33'), ('p2_x34')
) p(probe)

-- ::h264Cabac
WITH base AS (
  SELECT doc_id,
    CAST(20 + doc_id % 12 AS INT) AS qp,
    CAST(doc_id % 7 - 3 AS INT) AS l0,
    CAST(1 + doc_id % 3 AS INT) AS l1,
    CAST(doc_id % 5 - 2 AS INT) AS a1,
    CAST(2 * (doc_id % 2) - 1 AS INT) AS a2,
    CAST(1 + doc_id % 4 AS INT) AS a3,
    CAST(2 - doc_id % 5 AS INT) AS l2,
    CAST(doc_id % 9 - 4 AS INT) AS c0,
    CAST(1 + doc_id % 6 AS INT) AS c1,
    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END AS INT) AS tt,
    CAST(doc_id % 7 - 3 AS INT) AS l3,
    CAST(1 + doc_id % 5 AS INT) AS l4,
    CAST(15 + doc_id % 9 AS INT) AS big
  FROM documents
), scaled AS (
  SELECT *,
    qp // 6 AS k, (qp + 1) // 6 AS k1,
    ([10,11,13,14,16,18])[qp % 6 + 1] AS va,
    ([16,18,20,23,25,29])[qp % 6 + 1] AS vb,
    ([13,14,16,18,20,23])[qp % 6 + 1] AS vc,
    ([10,11,13,14,16,18])[(qp + 1) % 6 + 1] AS va1,
    ([13,14,16,18,20,23])[(qp + 1) % 6 + 1] AS vc1
  FROM base
), px0 AS (
  SELECT *,
    LEAST(255, GREATEST(0,
      128 + CAST(floor((l0 * va * (1 << (k - 2)) + 32) / 64.0) AS BIGINT)
    )) AS v0
  FROM scaled
), px1 AS (
  SELECT *,
    LEAST(255, GREATEST(0, v0 + CAST(floor((
      l1 * va1 * (1 << (k1 - 2)) + a1 * vc1 * (1 << k1)
      + a2 * vc1 * (1 << k1) + a3 * va1 * (1 << k1) + 32) / 64.0) AS BIGINT)
    )) AS p016,
    LEAST(255, GREATEST(0, v0 + CAST(floor((
      l1 * va1 * (1 << (k1 - 2)) + a3 * va1 * (1 << k1)
      - a1 * vc1 * (1 << k1) + a2 * vc1 * (1 << k1) + 32) / 64.0) AS BIGINT)
    )) AS p031,
    LEAST(255, GREATEST(0,
      128 + CAST(floor((l3 * va * (1 << (k - 2))
        + big * vc * (1 << k) + 32) / 64.0) AS BIGINT))) AS pesc,
    LEAST(255, GREATEST(0,
      128 + CAST(floor((l3 * va * (1 << (k - 2)) + 32) / 64.0) AS BIGINT)
    )) AS v3
  FROM px0
), px2 AS (
  SELECT *,
    LEAST(255, GREATEST(0, p031 + CAST(floor((
      l2 * va * (1 << (k - 2)) + a2 * vc * (1 << k)
      + a3 * vc * (1 << k) + a1 * va * (1 << k) + 32) / 64.0) AS BIGINT)
    )) AS p032,
    LEAST(255, GREATEST(0,
      v3 + CAST(floor((l4 * va * (1 << (k - 2)) + 32) / 64.0) AS BIGINT)
    )) AS phpred
  FROM px1
), px3 AS (
  SELECT *,
    LEAST(255, GREATEST(0,
      phpred + CAST(floor((c0 * va * (1 << k) + c1 * vc * (1 << k)
        + tt * vb * (1 << k) + 32) / 64.0) AS BIGINT))) AS p4x4
  FROM px2
)
SELECT doc_id, p.probe,
  48 AS width, 16 AS height, 2 AS n_frames,
  CAST(CASE p.probe
    WHEN 'f1_mb0' THEN v0
    WHEN 'f1_mb1_c0' THEN p016
    WHEN 'f1_mb1_c15' THEN p031
    WHEN 'f1_mb2' THEN p032
    WHEN 'f2_esc' THEN pesc
    WHEN 'f2_hpred' THEN phpred
    WHEN 'f2_i4x4' THEN p4x4
  END AS INT) AS px
FROM px3
CROSS JOIN (VALUES ('f1_mb0'), ('f1_mb1_c0'), ('f1_mb1_c15'),
  ('f1_mb2'), ('f2_esc'), ('f2_hpred'), ('f2_i4x4')) p(probe)

-- ::h264MultiRef
WITH base AS (
  SELECT doc_id,
    CAST(20 + doc_id % 12 AS INT) AS qp,
    CAST(40 + doc_id % 50 AS INT) AS g0,
    CAST(1 + doc_id % 3 AS INT) AS sh,
    CAST(1 + doc_id % 5 AS INT) AS lvl
  FROM documents
), scaled AS (
  SELECT *,
    qp // 6 AS k,
    ([10,11,13,14,16,18])[qp % 6 + 1] AS va
  FROM base
)
SELECT doc_id, p.probe,
  CAST(LEAST(255, GREATEST(0, CASE p.probe
    WHEN 'p2_a' THEN g0 + 16
    WHEN 'p2_b' THEN g0 + 32 + sh
    WHEN 'p2_res' THEN g0 + 32
      + CAST(floor((lvl * va * (1 << k) + 32) / 64.0) AS BIGINT)
    WHEN 'p3_a' THEN g0 + 16
    WHEN 'p3_skip' THEN g0 + 32 + sh
    WHEN 'p3_shift' THEN g0 + 49 + sh
  END)) AS INT) AS px
FROM scaled
CROSS JOIN (VALUES ('p2_a'), ('p2_b'), ('p2_res'), ('p3_a'),
  ('p3_skip'), ('p3_shift')) p(probe)

-- ::h264BSlice
WITH base AS (
  SELECT doc_id,
    CAST(20 + doc_id % 12 AS INT) AS qp,
    CAST(40 + doc_id % 50 AS INT) AS g0,
    CAST(1 + doc_id % 3 AS INT) AS sh,
    CAST(1 + doc_id % 5 AS INT) AS lvl
  FROM documents
), scaled AS (
  SELECT *,
    qp // 6 AS k,
    ([10,11,13,14,16,18])[qp % 6 + 1] AS va
  FROM base
)
SELECT doc_id, p.probe,
  CAST(LEAST(255, GREATEST(0, CASE p.probe
    WHEN 'b_l0' THEN g0 + 16 + sh
    WHEN 'b_l1' THEN g0 + 32
    WHEN 'b_bi' THEN g0 + 48 + (sh + 1) // 2
    WHEN 'b_res' THEN g0 + 32 + (sh + 1) // 2
      + CAST(floor((lvl * va * (1 << k) + 32) / 64.0) AS BIGINT)
    WHEN 'b_nonref' THEN g0 + 16 + sh
  END)) AS INT) AS px
FROM scaled
CROSS JOIN (VALUES ('b_l0'), ('b_l1'), ('b_bi'), ('b_res'),
  ('b_nonref')) p(probe)

-- ::h264Weighted
WITH base AS (
  SELECT doc_id,
    CAST(40 + doc_id % 50 AS INT) AS g0,
    CAST(doc_id % 3 AS INT) AS d1,
    CAST(2 + doc_id % 6 AS INT) AS w1,
    CAST(doc_id % 9 - 4 AS INT) AS o1,
    CAST((doc_id // 3) % 3 AS INT) AS d2,
    CAST(1 + doc_id % 4 AS INT) AS w2,
    CAST(doc_id % 7 - 3 AS INT) AS o2,
    CAST(3 + doc_id % 3 AS INT) AS w3,
    CAST(doc_id % 5 - 2 AS INT) AS o3
  FROM documents
), p1 AS (
  SELECT *,
    LEAST(255, GREATEST(0, CASE WHEN d1 >= 1
      THEN ((g0 + 16) * w1 + (1 << (d1 - 1))) // (1 << d1) + o1
      ELSE (g0 + 16) * w1 + o1 END)) AS v8,
    LEAST(255, GREATEST(0, CASE WHEN d1 >= 1
      THEN ((g0 + 48) * w1 + (1 << (d1 - 1))) // (1 << d1) + o1
      ELSE (g0 + 48) * w1 + o1 END)) AS v40
  FROM base
)
SELECT doc_id, p.probe,
  CAST(LEAST(255, GREATEST(0, CASE p.probe
    WHEN 'w_p1' THEN v8
    WHEN 'w_e0' THEN CASE WHEN d2 >= 1
      THEN (v8 * w2 + (1 << (d2 - 1))) // (1 << d2) + o2
      ELSE v8 * w2 + o2 END
    WHEN 'w_e1' THEN CASE WHEN d2 >= 1
      THEN ((g0 + 32) * w3 + (1 << (d2 - 1))) // (1 << d2) + o3
      ELSE (g0 + 32) * w3 + o3 END
    WHEN 'w_skip' THEN CASE WHEN d2 >= 1
      THEN (v40 * w2 + (1 << (d2 - 1))) // (1 << d2) + o2
      ELSE v40 * w2 + o2 END
  END)) AS INT) AS px
FROM p1
CROSS JOIN (VALUES ('w_p1'), ('w_e0'), ('w_e1'), ('w_skip')
) p(probe)

-- ::h264Partition
WITH base AS (
  SELECT doc_id,
    CAST(40 + doc_id % 50 AS INT) AS g0,
    CAST(1 + doc_id % 3 AS INT) AS sh
  FROM documents
)
SELECT doc_id, p.probe,
  CAST(LEAST(255, GREATEST(0, CASE p.probe
    WHEN 'pt_top' THEN g0 + 16 + sh
    WHEN 'pt_bot' THEN g0 + 32
    WHEN 'pt_left' THEN g0 + 28
    WHEN 'pt_right' THEN g0 + 39 + sh
    WHEN 'pt_16' THEN g0 + 48 + sh
  END)) AS INT) AS px
FROM base
CROSS JOIN (VALUES ('pt_top'), ('pt_bot'), ('pt_left'),
  ('pt_right'), ('pt_16')) p(probe)

-- ::h264CabacInter
WITH base AS (
  SELECT doc_id,
    CAST(20 + doc_id % 12 AS INT) AS qp,
    CAST(1 + doc_id % 5 AS INT) AS lvl,
    CAST(1 + doc_id % 3 AS INT) AS sh
  FROM documents
), scaled AS (
  SELECT *,
    qp // 6 AS k,
    ([10,11,13,14,16,18])[qp % 6 + 1] AS va
  FROM base
), dq AS (
  SELECT *,
    CAST(floor((lvl * va * (1 << k) + 32) / 64.0) AS BIGINT) AS dq_pos,
    CAST(floor((-lvl * va * (1 << k) + 32) / 64.0) AS BIGINT) AS dq_neg
  FROM scaled
)
SELECT doc_id, p.probe,
  CAST(LEAST(255, GREATEST(0, CASE p.probe
    WHEN 'c_mv' THEN 128 + CAST(floor((lvl * ((((14 + sh) // 4) % 5)
      - 2) * va * (1 << k) + 32) / 64.0) AS BIGINT)
    WHEN 'c_skip' THEN 128 + CAST(floor((lvl * (((24 // 4) % 5) - 2)
      * va * (1 << k) + 32) / 64.0) AS BIGINT)
    WHEN 'c_ref' THEN 128 + dq_pos
    WHEN 'c_left' THEN 128 + CAST(floor((lvl * ((((14 + sh) // 4) % 5)
      - 2) * va * (1 << k) + 32) / 64.0) AS BIGINT)
    WHEN 'c_right' THEN 128 + CAST(floor((lvl * ((((24 + 2 * sh) // 4)
      % 5) - 2) * va * (1 << k) + 32) / 64.0) AS BIGINT)
    WHEN 'c_res' THEN 128 + dq_pos + dq_neg
  END)) AS INT) AS px
FROM dq
CROSS JOIN (VALUES ('c_mv'), ('c_skip'), ('c_ref'), ('c_left'),
  ('c_right'), ('c_res')) p(probe)

-- ::h264SubPartition
WITH base AS (
  SELECT doc_id,
    CAST(20 + doc_id % 12 AS INT) AS qp,
    CAST(40 + doc_id % 50 AS INT) AS g0,
    CAST(1 + doc_id % 3 AS INT) AS sh,
    CAST(1 + doc_id % 5 AS INT) AS lvl
  FROM documents
), scaled AS (
  SELECT *,
    qp // 6 AS k,
    ([10,11,13,14,16,18])[qp % 6 + 1] AS va
  FROM base
)
SELECT doc_id, p.probe,
  CAST(LEAST(255, GREATEST(0, CASE p.probe
    WHEN 'p88' THEN g0 + 2 + 2 * sh + 4
    WHEN 'p84t' THEN g0 + 10 + 2
    WHEN 'p84b' THEN g0 + 11 + 14
    WHEN 'p48l' THEN g0 + 21 + 3 * sh
    WHEN 'p48r' THEN g0 + 25 + sh
    WHEN 'p44' THEN g0 + 14 + 28
    WHEN 'p8res' THEN g0 + 19
      + CAST(floor((lvl * va * (1 << k) + 32) / 64.0) AS BIGINT)
    WHEN 'p8ref' THEN g0 + 30 + sh
  END)) AS INT) AS px
FROM scaled
CROSS JOIN (VALUES ('p88'), ('p84t'), ('p84b'), ('p48l'),
  ('p48r'), ('p44'), ('p8res'), ('p8ref')) p(probe)

-- ::h264RefListMod
WITH base AS (
  SELECT doc_id,
    CAST(40 + doc_id % 50 AS INT) AS g0,
    CAST(1 + doc_id % 3 AS INT) AS sh
  FROM documents
)
SELECT doc_id, p.probe,
  CAST(LEAST(255, GREATEST(0, CASE p.probe
    WHEN 'r2_i' THEN g0 + 8 + 8
    WHEN 'r2_p' THEN g0 + 24 + sh + 8
    WHEN 'r2_skip' THEN g0 + 40 + 8
    WHEN 'r3_p1' THEN g0 + 9 + sh + 8
    WHEN 'r3_p2' THEN g0 + 24 + sh + 8
    WHEN 'r3_i' THEN g0 + 40 + 8
  END)) AS INT) AS px
FROM base
CROSS JOIN (VALUES ('r2_i'), ('r2_p'), ('r2_skip'),
  ('r3_p1'), ('r3_p2'), ('r3_i')) p(probe)

-- ::h264MultiSlice
WITH base AS (
  SELECT doc_id,
    CAST(20 + doc_id % 12 AS INT) AS qp,
    CAST(40 + doc_id % 50 AS INT) AS g0,
    CAST(1 + doc_id % 3 AS INT) AS sh,
    CAST(1 + doc_id % 5 AS INT) AS lvl
  FROM documents
), scaled AS (
  SELECT *,
    qp // 6 AS k,
    ([10,11,13,14,16,18])[qp % 6 + 1] AS va
  FROM base
), dq AS (
  SELECT *,
    CAST(floor((lvl * va * (1 << k) + 32) / 64.0) AS BIGINT) AS dqv,
    CAST(floor((-lvl * va * (1 << k) + 32) / 64.0) AS BIGINT) AS dqn
  FROM scaled
)
SELECT doc_id, p.probe,
  CAST(LEAST(255, GREATEST(0, CASE p.probe
    WHEN 'ms_skip' THEN g0 + 20 + sh + 40
    WHEN 'ms_edge_q' THEN g0 + 24 + sh + 32
    WHEN 'ms_edge_p' THEN g0 + 25 + sh + 30 + dqv
    WHEN 'ms_mv' THEN g0 + 4 + sh + 8
    WHEN 'ms_s2' THEN g0 + 40 + sh + 40 + dqn
    WHEN 'ms_band' THEN g0 + 36 + sh + 32 + dqn
  END)) AS INT) AS px
FROM dq
CROSS JOIN (VALUES ('ms_skip'), ('ms_edge_q'), ('ms_edge_p'),
  ('ms_mv'), ('ms_s2'), ('ms_band')) p(probe)

