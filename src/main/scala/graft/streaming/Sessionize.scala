package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via the typed KeyValueGroupedDataset API —
  * the Spark-native replacement for hand-rolled per-key state machines.
  *
  * `sessionCounts` maintains one small state record per user (last event
  * time + running session/event counters) and emits the updated totals on
  * every batch. State size is O(active users) and independent of event
  * volume — the property that lets this run indefinitely at stream scale;
  * eviction of idle users would add a ProcessingTimeTimeout on the same
  * state handle.
  */
object Sessionize {

  final case class UserEvent(event_id: Long, ts_us: Long, user_id: Long)
  final case class SessionState(lastTsUs: Long, nSessions: Long, nEvents: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Gaps-and-islands sessionization as streaming state: a new session
    * starts when the gap since the user's previous event exceeds
    * `gapMinutes`. Events inside one batch are sorted by (ts, id) before
    * folding — the group iterator carries no order guarantee.
    */
  def updateUser(gapUs: Long)(
      user: Long, events: Iterator[UserEvent],
      state: GroupState[SessionState]): Iterator[UserSessions] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
    sorted.foreach { e =>
      val newSession = st.lastTsUs == Long.MinValue || e.ts_us - st.lastTsUs > gapUs
      st = SessionState(e.ts_us,
        st.nSessions + (if (newSession) 1 else 0),
        st.nEvents + 1)
    }
    if (sorted.nonEmpty) state.update(st)
    if (sorted.isEmpty) Iterator.empty
    else Iterator.single(UserSessions(user, st.nSessions, st.nEvents))
  }

  /** Wire a (streaming or batch) typed event Dataset through the stateful
    * operator. Update output mode: each batch emits refreshed per-user
    * totals for users seen in that batch.
    */
  def sessionCounts(events: Dataset[UserEvent], gapMinutes: Int): Dataset[UserSessions] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[UserSessions]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        updateUser(gapMinutes.toLong * 60L * 1000000L))
  }
}
