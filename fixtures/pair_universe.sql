WITH sup AS (SELECT article, supplier_price, row_id FROM (
  SELECT l_partkey AS article, l_extendedprice AS supplier_price,
         l_orderkey*8+l_linenumber AS row_id,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY l_orderkey*8+l_linenumber DESC) AS rn
  FROM lineitem) WHERE rn = 1),
 base AS (SELECT p_partkey AS article, p_retailprice AS base_price, p_name AS name
FROM part WHERE p_partkey % 97 <> 0),
 new_items AS (SELECT s.* FROM sup s
   WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.article = s.article)),
 sup_named AS (SELECT article, supplier_price, row_id,
     (CASE WHEN article % 8 = 0 THEN 'XIAOMI Power bank '
      WHEN article % 8 = 1 THEN 'SAMSUNG Power bank '
      WHEN article % 8 = 2 THEN 'HUAWEI Power bank '
      ELSE 'Power bank ' END ||
 list_extract(['black','white','red','blue'], CAST(article % 4 + 1 AS INT)) || ' ' ||
 CAST((article % 20 + 5) * 1000 AS VARCHAR) || 'mah' ||
 CASE WHEN article % 2 = 0 THEN ' (PB-' || CAST(article % 450 AS VARCHAR) || ')'
      ELSE '' END) AS name,
     list_extract(['black','white','red','blue'], CAST(article % 4 + 1 AS INT)) AS color FROM new_items),
 sup_coded AS (SELECT article, supplier_price, row_id, name, color,
     (CASE WHEN regexp_matches(upper(trim(regexp_extract(name, '\(([^)]+)\)', 1))),
           '^[A-Za-zА-Яа-я0-9\-]+$')
       AND length(upper(trim(regexp_extract(name, '\(([^)]+)\)', 1)))) >= 4
  THEN upper(trim(regexp_extract(name, '\(([^)]+)\)', 1))) END) AS code,
     COALESCE((CASE WHEN TRY_CAST(regexp_extract(lower(name), '(\d+)\s*mah', 1) AS BIGINT)
           BETWEEN 5 AND 999999
      THEN regexp_extract(lower(name), '(\d+)\s*mah', 1) END), (CASE WHEN TRY_CAST(regexp_extract(lower(name), '(\d+)\s*мач', 1) AS BIGINT)
           BETWEEN 5 AND 999999
      THEN regexp_extract(lower(name), '(\d+)\s*мач', 1) END), (CASE WHEN TRY_CAST(regexp_extract(lower(name), '(\d+)\s*мч', 1) AS BIGINT)
           BETWEEN 5 AND 999999
      THEN regexp_extract(lower(name), '(\d+)\s*мч', 1) END)) AS capacity FROM sup_named),
 base_named AS (SELECT article AS base_article, base_price, name AS p_name,
     (CASE WHEN article % 3 = 0 THEN name || ' ' || list_extract(['black','white','red','blue','green'], CAST(article % 5 + 1 AS INT)) || ' ' ||
        CAST((article % 25 + 5) * 1000 AS VARCHAR) || 'mah (PB-' ||
        CAST(article % 300 AS VARCHAR) || ')'
      WHEN article % 3 = 1 THEN
        (CASE WHEN article % 8 = 0 THEN 'XIAOMI ' WHEN article % 8 = 1 THEN 'SAMSUNG '
              WHEN article % 8 = 2 THEN 'HUAWEI ' WHEN article % 8 = 3 THEN 'APPLE '
              ELSE 'OPPO ' END) ||
        name || ' ' || list_extract(['black','white','red','blue','green'], CAST(article % 5 + 1 AS INT)) || ' ' ||
        CAST((article % 25 + 5) * 1000 AS VARCHAR) || 'mah'
      ELSE name || ' ' || list_extract(['black','white','red','blue','green'], CAST(article % 5 + 1 AS INT)) END) AS bname,
     list_extract(['black','white','red','blue','green'], CAST(article % 5 + 1 AS INT)) AS bcolor FROM base),
 base_coded AS (SELECT base_article, base_price, p_name, bname, bcolor,
     (CASE WHEN regexp_matches(upper(trim(regexp_extract(bname, '\(([^)]+)\)', 1))),
           '^[A-Za-zА-Яа-я0-9\-]+$')
       AND length(upper(trim(regexp_extract(bname, '\(([^)]+)\)', 1)))) >= 4
  THEN upper(trim(regexp_extract(bname, '\(([^)]+)\)', 1))) END) AS bcode,
     COALESCE((CASE WHEN TRY_CAST(regexp_extract(lower(bname), '(\d+)\s*mah', 1) AS BIGINT)
           BETWEEN 5 AND 999999
      THEN regexp_extract(lower(bname), '(\d+)\s*mah', 1) END), (CASE WHEN TRY_CAST(regexp_extract(lower(bname), '(\d+)\s*мач', 1) AS BIGINT)
           BETWEEN 5 AND 999999
      THEN regexp_extract(lower(bname), '(\d+)\s*мач', 1) END), (CASE WHEN TRY_CAST(regexp_extract(lower(bname), '(\d+)\s*мч', 1) AS BIGINT)
           BETWEEN 5 AND 999999
      THEN regexp_extract(lower(bname), '(\d+)\s*мч', 1) END)) AS bcapacity FROM base_named),
 bracket_pairs AS (SELECT s.article, s.code, b.base_article,
     CASE WHEN s.color = b.bcolor AND s.capacity = b.bcapacity THEN 3
          WHEN s.color = b.bcolor THEN 2
          WHEN s.capacity = b.bcapacity THEN 1 ELSE 0 END AS score
   FROM sup_coded s JOIN base_coded b ON s.code = b.bcode),
 bracket_scored AS (SELECT *, row_number() OVER
     (PARTITION BY article ORDER BY score DESC, base_article ASC) AS rn
   FROM bracket_pairs),
 bracket_best AS (SELECT article, code, base_article, score
   FROM bracket_scored WHERE rn = 1),
 uni_rest AS (SELECT * FROM sup_coded s
   WHERE NOT EXISTS (SELECT 1 FROM bracket_best f WHERE f.article = s.article)),
 sup_uni AS (SELECT article, color, capacity,
     COALESCE((CASE WHEN regexp_matches(upper(trim(regexp_extract(name, '\(([^)]+)\)', 1))),
           '^[A-Za-zА-Яа-я0-9\-]+$')
       AND length(upper(trim(regexp_extract(name, '\(([^)]+)\)', 1)))) >= 4
  THEN upper(trim(regexp_extract(name, '\(([^)]+)\)', 1))) END),
 CASE WHEN contains(upper(name), 'GREENOE') THEN 'GREENOE' WHEN contains(upper(name), 'XIAOMI') THEN 'XIAOMI' WHEN contains(upper(name), 'SAMSUNG') THEN 'SAMSUNG' WHEN contains(upper(name), 'APPLE') THEN 'APPLE' WHEN contains(upper(name), 'HUAWEI') THEN 'HUAWEI' WHEN contains(upper(name), 'OPPO') THEN 'OPPO' WHEN contains(upper(name), 'VIVO') THEN 'VIVO' WHEN contains(upper(name), 'ONEPLUS') THEN 'ONEPLUS' END,
 (CASE WHEN length(COALESCE(list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z0-9]+(?:-[A-Z0-9]+)+)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z]{2,}[0-9]{2,}[A-Z]*)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([0-9]{3,}[A-Z]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z][0-9]{4,}[A-Z][0-9]+)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z]{4,8})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z][0-9]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([А-Я][0-9]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1))) >= 4 THEN COALESCE(list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z0-9]+(?:-[A-Z0-9]+)+)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z]{2,}[0-9]{2,}[A-Z]*)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([0-9]{3,}[A-Z]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z][0-9]{4,}[A-Z][0-9]+)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z]{4,8})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z][0-9]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(name), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([А-Я][0-9]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1)) END)) AS ucode FROM uni_rest),
 base_uni AS (SELECT base_article, bcolor, bcapacity,
     COALESCE((CASE WHEN regexp_matches(upper(trim(regexp_extract(bname, '\(([^)]+)\)', 1))),
           '^[A-Za-zА-Яа-я0-9\-]+$')
       AND length(upper(trim(regexp_extract(bname, '\(([^)]+)\)', 1)))) >= 4
  THEN upper(trim(regexp_extract(bname, '\(([^)]+)\)', 1))) END),
 CASE WHEN contains(upper(bname), 'GREENOE') THEN 'GREENOE' WHEN contains(upper(bname), 'XIAOMI') THEN 'XIAOMI' WHEN contains(upper(bname), 'SAMSUNG') THEN 'SAMSUNG' WHEN contains(upper(bname), 'APPLE') THEN 'APPLE' WHEN contains(upper(bname), 'HUAWEI') THEN 'HUAWEI' WHEN contains(upper(bname), 'OPPO') THEN 'OPPO' WHEN contains(upper(bname), 'VIVO') THEN 'VIVO' WHEN contains(upper(bname), 'ONEPLUS') THEN 'ONEPLUS' END,
 (CASE WHEN length(COALESCE(list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z0-9]+(?:-[A-Z0-9]+)+)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z]{2,}[0-9]{2,}[A-Z]*)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([0-9]{3,}[A-Z]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z][0-9]{4,}[A-Z][0-9]+)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z]{4,8})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z][0-9]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([А-Я][0-9]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1))) >= 4 THEN COALESCE(list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z0-9]+(?:-[A-Z0-9]+)+)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z]{2,}[0-9]{2,}[A-Z]*)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([0-9]{3,}[A-Z]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z][0-9]{4,}[A-Z][0-9]+)(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z]{4,8})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([A-Z][0-9]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1),
    list_extract(list_filter(regexp_extract_all(upper(bname), '(?:^|[^A-Za-zА-Яа-яЁё0-9_])([А-Я][0-9]{1,3})(?:[^A-Za-zА-Яа-яЁё0-9_]|$)', 1), x -> NOT (regexp_matches(lower(x), '^\d+(mah|wh|w|ma)$') OR regexp_matches(x, '^\d{5,}$') OR x IN ('USB-C', 'POWER', 'PORTABLE', 'CHARGER', 'BANK'))), 1)) END)) AS bucode FROM base_coded),
 uni_pairs AS (SELECT s.article, s.ucode AS code, b.base_article,
     CASE WHEN s.color = b.bcolor AND s.capacity = b.bcapacity THEN 3
          WHEN s.color = b.bcolor THEN 2
          WHEN s.capacity = b.bcapacity THEN 1 ELSE 0 END AS score
   FROM sup_uni s JOIN base_uni b ON s.ucode = b.bucode
   WHERE s.ucode IS NOT NULL),
 uni_scored AS (SELECT *, row_number() OVER
     (PARTITION BY article ORDER BY score DESC, base_article ASC) AS rn
   FROM uni_pairs),
 uni_best AS (SELECT article, code, base_article, score
   FROM uni_scored WHERE rn = 1)
SELECT s.article, lower(s.name) AS cand_lc,
       b.base_article, lower(b.bname) AS base_lc
FROM sup_coded s CROSS JOIN base_coded b
ORDER BY s.article, b.base_article
